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

    // in-flight telemetry (Dataset.observe): the gate/dedup counters ride
    // the micro-batch pass and land in the progress events — no extra scan
    val (rowsIn, belowQ, emptyT, nullL, rowsOut) = q.recentProgress
      .flatMap(p => Option(p.observedMetrics))
      .foldLeft((0L, 0L, 0L, 0L, 0L)) { case (acc, m) =>
        val in = Option(m.get(Ingest.ObserveIn))
        val outM = Option(m.get(Ingest.ObserveOut))
        (acc._1 + in.map(_.getAs[Long]("rows_in")).getOrElse(0L),
          acc._2 + in.map(_.getAs[Long]("below_quality")).getOrElse(0L),
          acc._3 + in.map(_.getAs[Long]("empty_text")).getOrElse(0L),
          acc._4 + in.map(_.getAs[Long]("null_lang")).getOrElse(0L),
          acc._5 + outM.map(_.getAs[Long]("rows_out")).getOrElse(0L))
      }
    assert(rowsIn == 4, s"rows_in=$rowsIn")
    assert(belowQ == 1, s"below_quality=$belowQ")
    assert(emptyT == 0 && nullL == 0)
    assert(rowsOut == 2, s"rows_out=$rowsOut")

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

  private def parquetFilesUnder(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(dir)).filter(_.getName.endsWith(".parquet"))
  }

  private def batchOf(i: Int) = {
    import TestSpark.spark.implicits._
    Seq(
      (i * 10L, s"alpha doc $i body", "en", "s1"),
      (i * 10L + 1, s"beta doc $i body", "en", "s2"),
      (i * 10L + 2, s"gamma doc $i body", "es", "s1"))
      .toDF("doc_id", "text", "lang", "source")
  }

  test("compactShards: 20 micro-batches collapse to one generation — same rows, fewer files, pruning kept") {
    val out = Files.createTempDirectory("ingest_compact").toString
    (0 until 20).foreach(i => Ingest.commitBatch(batchOf(i), out, i.toLong))
    def rows() = spark.read.parquet(out)
      .select("doc_id", "text", "lang", "source")
      .collect().map(_.toString).sorted.toSeq
    val before = rows()
    val filesBefore = parquetFilesUnder(out).size

    val statsEn = graft.sources.Writers.compactShards(spark, out, "en")
    val statsEs = graft.sources.Writers.compactShards(spark, out, "es")
    // the hot (highest) batch dir stays out of the merge; everything else
    // (19 dirs per lang) folds into one generation dir
    assert(statsEn.dirsCompacted == 19 && statsEs.dirsCompacted == 19)
    assert(statsEn.generation == -1L)
    assert(rows() == before, "compaction must not change the row set")
    val filesAfter = parquetFilesUnder(out).size
    assert(filesAfter < filesBefore, s"$filesAfter !< $filesBefore")
    assert(new java.io.File(s"$out/lang=en/batch_id=-1").isDirectory)
    assert(new java.io.File(s"$out/lang=en/batch_id=19").isDirectory)

    // lang pruning survives: the physical scan's partition pruning (not
    // inputFiles, which reports the unpruned relation) selects only this
    // lang's dirs
    val pruned = spark.read.parquet(out).filter("lang = 'es'")
    assert(pruned.count() == 20)
    val scanned = pruned.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.selectedPartitions.toPartitionArray
          .map(_.filePath.toPath.toString).toSeq
    }.flatten
    assert(scanned.nonEmpty && scanned.forall(_.contains("lang=es")), scanned)

    // the protected hot batch replays idempotently post-compaction
    Ingest.commitBatch(batchOf(19), out, 19L)
    assert(rows() == before)

    // a second compaction with no new batches is a no-op (the lone
    // generation is not re-rolled; the hot dir stays protected)
    val noop = graft.sources.Writers.compactShards(spark, out, "en")
    assert(noop.dirsCompacted == 0)

    // after one MORE batch, the old hot dir becomes compactable and folds
    // together with generation -1 into generation -2
    Ingest.commitBatch(batchOf(20), out, 20L)
    val again = graft.sources.Writers.compactShards(spark, out, "en")
    assert(again.dirsCompacted == 2 && again.generation == -2L)
    assert(spark.read.parquet(out).filter("lang = 'en'").count() == 42)
  }

  test("compactShards heals a crash inside the swap window (no duplicate rows)") {
    val out = Files.createTempDirectory("ingest_crash").toString
    (0 until 5).foreach(i => Ingest.commitBatch(batchOf(i), out, i.toLong))
    def enRows() = spark.read.parquet(out).filter("lang = 'en'")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val before = enRows()

    // crash simulation: generation -1 is published but the replaced dirs
    // were never deleted — rows exist TWICE on disk, manifest still present
    graft.sources.Writers.compactShardsInternal(spark, out, "en",
      targetFileBytes = 128L * 1024 * 1024, maxRecordsPerFile = 1000000L,
      sortCols = Seq("doc_id"), crashBeforeDelete = true)
    assert(new java.io.File(s"$out/lang=en/batch_id=-1").isDirectory)
    assert(new java.io.File(s"$out/lang=en/batch_id=0").isDirectory)
    assert(enRows() != before, "crash window should expose duplicates")

    // next regular run heals: replaced dirs deleted first, then a normal
    // compaction — the row set is exactly the original again. Driven via
    // the lang-discovering maintenance entry point.
    val all = graft.sources.Writers.compactAllLangs(spark, out)
    assert(all.map(_.lang).toSet == Set("en", "es"))
    assert(enRows() == before)
    assert(!new java.io.File(s"$out/lang=en/batch_id=0").exists)
  }
}
