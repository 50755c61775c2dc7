package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamJoins

/** Stream-stream interval join, stream-static enrichment, and watermarked
  * dedup each agree with their batch duals on the same input.
  */
class StreamJoinsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def loadEvents(): Seq[TsEvent] = {
    import org.apache.spark.sql.functions.col
    graft.sources.Tables.eventsNormalized(spark, "/root/testdata/sf0.001")
      .select(col("ts").cast("timestamp"), col("event_type"), col("user_id"), col("value"))
      .collect()
      .map(r => TsEvent(r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq
  }

  private def runOnce(df: org.apache.spark.sql.DataFrame, name: String,
      mode: OutputMode = OutputMode.Append()): Unit = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode)
      .trigger(Trigger.Once())
      .option("checkpointLocation", Files.createTempDirectory(name).toString)
      .start()
    q.awaitTermination(120000); q.stop()
  }

  test("stream-stream interval join == batch interval join") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = loadEvents()
    val ms = MemoryStream[TsEvent]
    ms.addData(events)
    runOnce(StreamJoins.signupPurchaseInterval(ms.toDF()), "interval_join_stream")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getTimestamp(1).getTime, r.getTimestamp(2).getTime, r.getDouble(3))
    val streamed = spark.table("interval_join_stream").collect().map(key).toSet
    val batch = StreamJoins.signupPurchaseInterval(spark.createDataset(events).toDF())
      .collect().map(key).toSet
    assert(streamed.nonEmpty && streamed == batch,
      s"stream=${streamed.size} batch=${batch.size}")
  }

  test("stream-static broadcast enrichment == batch join") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = loadEvents()
    val dim = Seq(("signup", 1), ("purchase", 2), ("click", 3), ("view", 4))
      .toDF("event_type", "type_code")
    val ms = MemoryStream[TsEvent]
    ms.addData(events)
    runOnce(StreamJoins.enrich(ms.toDF(), dim, "event_type"), "enrich_stream")
    val streamed = spark.table("enrich_stream").count()
    assert(streamed == events.size)
    val codes = spark.table("enrich_stream")
      .groupBy("type_code").count().collect()
      .map(r => (r.isNullAt(0), r.getLong(1))).toMap
    assert(!codes.contains(true) || codes.keySet.size > 1)
  }

  test("dropDuplicatesWithinWatermark == batch dropDuplicates") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = loadEvents().take(500)
    val dupes = events ++ events.take(200) // re-deliver 200 events
    val ms = MemoryStream[TsEvent]
    ms.addData(dupes)
    runOnce(StreamJoins.dedupWithinWatermark(ms.toDF(), "ts", "10 minutes",
      Seq("user_id", "ts")), "dedup_stream")
    val streamed = spark.table("dedup_stream").count()
    val batch = StreamJoins.dedupWithinWatermark(
      spark.createDataset(dupes).toDF(), "ts", "10 minutes", Seq("user_id", "ts")).count()
    assert(streamed == batch)
  }
}
