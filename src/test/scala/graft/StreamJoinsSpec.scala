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
    graft.sources.Tables.eventsNormalized(spark, TestSpark.sf0001)
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

  test("left-outer interval join == batch dual once the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = loadEvents()
    val maxTs = events.map(_.ts.getTime).max
    // sentinel far past every real event: pushes both watermarks beyond
    // s_ts + maxGap for all state, forcing the null-side emissions
    // the global watermark is min() across BOTH branch watermarks, so a
    // sentinel must arrive on each branch (signup AND purchase) to move it
    def sentinel(days: Long) = Seq("purchase", "signup").map(t =>
      TsEvent(new Timestamp(maxTs + days * 24 * 3600 * 1000), t, -1L, 0.0))
    val ms = MemoryStream[TsEvent]
    val q = StreamJoins.signupPurchaseIntervalOuter(ms.toDF())
      .writeStream.format("memory").queryName("outer_join_stream")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", Files.createTempDirectory("oj").toString)
      .start()
    try {
      ms.addData(events)
      q.processAllAvailable()
      // eviction uses the watermark as of the PREVIOUS batch, so two
      // sentinel batches are needed: the first advances the watermark past
      // every real event, the second actually flushes the residual state
      ms.addData(sentinel(30))
      q.processAllAvailable()
      ms.addData(sentinel(60))
      q.processAllAvailable()
    } finally q.stop()
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0),
      if (r.isNullAt(1)) -1L else r.getTimestamp(1).getTime,
      r.getTimestamp(2).getTime, r.getDouble(3))
    val streamed = spark.table("outer_join_stream")
      .collect().map(key).filterNot(_._1 == -1L).toSet
    val batch = StreamJoins.signupPurchaseIntervalOuter(
      spark.createDataset(events).toDF()).collect().map(key).toSet
    val nullSide = streamed.count(_._2 == -1L)
    assert(streamed == batch, s"stream=${streamed.size} batch=${batch.size}")
    assert(nullSide > 0, "expected unmatched purchases to emit with null signup")
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
