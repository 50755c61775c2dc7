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
    // hive partitioning by lang is prunable (top-level), sub-partitioned
    // by the committing micro-batch id
    assert(new java.io.File(s"$out/lang=en").exists())
    assert(new java.io.File(s"$out/lang=es").exists())
    assert(new java.io.File(s"$out/lang=en").listFiles()
      .exists(_.getName.startsWith("batch_id=")))
    assert(got.filter("lang = 'es'").count() == 1)
  }

  test("batch commit is idempotent: replaying a batch id leaves the shard set unchanged") {
    import spark.implicits._
    val out = Files.createTempDirectory("ingest_replay").toString
    val b0 = Seq(
      (1L, "alpha doc", "en", "s1"),
      (2L, "beta doc", "es", "s1")).toDF("doc_id", "text", "lang", "source")
    graft.streaming.Ingest.commitBatch(b0, out, 0L)
    def shardFiles(): Seq[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(out)).map(_.getName).filter(_.endsWith(".parquet")).sorted
    }
    val afterFirst = spark.read.parquet(out).collect().map(_.toString).sorted.toSeq
    val files = shardFiles()

    // micro-batch retry: SAME batch id, same (checkpoint-replayed) rows —
    // dynamic overwrite replaces the batch's partitions instead of
    // appending duplicates
    graft.streaming.Ingest.commitBatch(b0, out, 0L)
    val afterReplay = spark.read.parquet(out).collect().map(_.toString).sorted.toSeq
    assert(afterReplay == afterFirst)
    assert(shardFiles().size == files.size)

    // a NEW batch id appends alongside, touching no prior partitions
    val b1 = Seq((3L, "gamma doc", "en", "s2")).toDF("doc_id", "text", "lang", "source")
    graft.streaming.Ingest.commitBatch(b1, out, 1L)
    val all = spark.read.parquet(out)
    assert(all.count() == 3)
    assert(all.filter("batch_id = 0").count() == 2)
    assert(all.filter("batch_id = 1").count() == 1)
  }
}
