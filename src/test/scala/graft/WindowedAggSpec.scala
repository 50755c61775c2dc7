package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.WindowedAgg

final case class TsEvent(ts: Timestamp, event_type: String, user_id: Long, value: Double)

/** Streaming windowed aggregation ≡ the same window expression on the
  * equivalent batch frame.
  */
class WindowedAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def loadEvents(): Seq[TsEvent] = {
    import org.apache.spark.sql.functions.col
    graft.sources.Tables.eventsNormalized(spark, TestSpark.sf0001)
      .select(col("ts").cast("timestamp"), col("event_type"), col("user_id"), col("value"))
      .collect()
      .map(r => TsEvent(r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq
  }

  test("streaming tumbling window == batch tumbling window") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = loadEvents()
    val ms = MemoryStream[TsEvent]
    ms.addData(events)
    val q = WindowedAgg.tumbling(ms.toDF())
      .writeStream.format("memory").queryName("tumbling_stream")
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.Once())
      .option("checkpointLocation", Files.createTempDirectory("wm").toString)
      .start()
    q.awaitTermination(120000); q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getTimestamp(0).getTime, r.getString(2), r.getLong(3), r.getDouble(4))
    val streamed = spark.table("tumbling_stream").collect().map(key).toSet
    val batch = WindowedAgg.tumbling(spark.createDataset(events).toDF())
      .collect().map(key).toSet
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming KMV windowed distinct == batch exactly (sketch state round-trips the store)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = loadEvents()
    val ms = MemoryStream[TsEvent]
    // two adds → two micro-batches: the second batch MERGES its partial
    // sketches into serialized state from the first, exercising
    // serialize/deserialize + merge through the state store
    val (first, second) = events.splitAt(events.size / 2)
    ms.addData(first)
    ms.addData(second)
    val q = WindowedAgg.tumblingDistinct(ms.toDF())
      .writeStream.format("memory").queryName("kmv_stream")
      .outputMode(OutputMode.Complete())
      .option("checkpointLocation", Files.createTempDirectory("wmk").toString)
      .start()
    q.processAllAvailable(); q.stop()
    def key(r: org.apache.spark.sql.Row) = (r.getTimestamp(0).getTime, r.getLong(1), r.getLong(2))
    val streamed = spark.table("kmv_stream").collect().map(key).toSet
    val batch = WindowedAgg.tumblingDistinct(spark.createDataset(events).toDF())
      .collect().map(key).toSet
    // merge-order invariance ⇒ EQUALITY, not approximation
    assert(streamed.nonEmpty && streamed == batch,
      s"streamed=${streamed.size} batch=${batch.size} diff=${(streamed -- batch).take(3)}")
  }

  test("native session window agrees with lag/cum-sum sessionization counts") {
    import spark.implicits._
    val events = loadEvents()
    val native = WindowedAgg.sessions(spark.createDataset(events).toDF())
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(3))).toSet
    val lagBased = graft.operators.Analytics.queries("q_sessionize")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(4))).toSet
    assert(native.nonEmpty && native == lagBased,
      s"native=${native.size} lag=${lagBased.size} diff=${(native -- lagBased).take(3)}")
  }
}
