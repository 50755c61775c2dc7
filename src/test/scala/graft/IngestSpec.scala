package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Ingest

/** One doc per line of the streaming ingest funnel: quality gate,
  * watermarked exact dedup, lang-partitioned shard append.
  */
final case class IngestDoc(
    doc_id: Long,
    text: String,
    lang: String,
    source: String,
    event_time: java.sql.Timestamp
)

class IngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("streaming ingest: quality-gates, dedups within watermark, shards by lang") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val good = "spark streams the fraud rows into tidy shards quickly and cleanly today"
    val in = MemoryStream[IngestDoc]
    in.addData(
      IngestDoc(1L, good, "en", "s1", ts("2024-01-01 00:00:00")),
      IngestDoc(2L, good, "en", "s1", ts("2024-01-01 00:00:01")),       // exact dup
      IngestDoc(3L, "a a a a", "en", "s2", ts("2024-01-01 00:00:02")),  // low quality
      IngestDoc(4L, good + " es", "es", "s3", ts("2024-01-01 00:00:03")))
    val out = Files.createTempDirectory("ingest_out").toString
    val q = Ingest.ingest(in.toDF(), out,
      Files.createTempDirectory("ingest_ckpt").toString)
    try q.processAllAvailable() finally q.stop()

    val got = spark.read.parquet(out)
    val ids = got.select("doc_id").collect().map(_.getLong(0)).toSet
    // dup suppressed (one of 1/2 survives), low-quality dropped
    assert(ids.intersect(Set(1L, 2L)).size == 1)
    assert(!ids.contains(3L))
    assert(ids.contains(4L))
    // hive partitioning by lang is prunable
    assert(new java.io.File(s"$out/lang=en").exists())
    assert(new java.io.File(s"$out/lang=es").exists())
    assert(got.filter("lang = 'es'").count() == 1)
  }
}
