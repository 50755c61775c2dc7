package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamDedup

/** The streaming near-dup detector must agree exactly with its batch
  * twin: same corpus, same pairs — the house-style stream ≡ batch
  * equivalence proof.
  */
class StreamDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("streaming near-dup pairs == batch dedup_simhash_pairs") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => StreamDedup.DocArrival(r.getLong(0), r.getString(1),
        1700000000000L + r.getLong(0))) // all arrivals within the horizon
    val in = MemoryStream[StreamDedup.DocArrival]
    in.addData(docs.toSeq)
    val q = StreamDedup.nearDupPairs(in.toDS(), withinMs = 3600000L)
      .writeStream.format("memory").queryName("sdp")
      .outputMode("append").trigger(Trigger.Once())
      .option("checkpointLocation", Files.createTempDirectory("sdp").toString)
      .start()
    q.awaitTermination()
    val got = spark.table("sdp").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val exp = graft.operators.Dedup.queries("dedup_simhash_pairs")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(exp.nonEmpty)
    assert(got == exp)
  }

  test("dedup horizon: pairs farther apart than withinMs are not reported") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val text = "the quick brown fox jumps over the lazy dog again and again today"
    val in = MemoryStream[StreamDedup.DocArrival]
    in.addData(
      StreamDedup.DocArrival(1L, text, 0L),
      StreamDedup.DocArrival(2L, text, 5000L),      // within horizon of #1
      StreamDedup.DocArrival(3L, text, 10000000L))  // far beyond horizon
    val q = StreamDedup.nearDupPairs(in.toDS(), withinMs = 60000L)
      .writeStream.format("memory").queryName("sdp_h")
      .outputMode("append").trigger(Trigger.Once())
      .option("checkpointLocation", Files.createTempDirectory("sdp_h").toString)
      .start()
    q.awaitTermination()
    val got = spark.table("sdp_h").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)))
  }
}
