package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Overlap
import graft.streaming.OverlapStream

/** The stream-maintained overlap store must equal the one-shot batch
  * computation over the same documents — and a replayed batch must
  * leave the store untouched (the semilattice/CRDT property the
  * operator's no-bookkeeping design rests on).
  */
class OverlapStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  private def corpusDocs(): Seq[OverlapStream.SourceDoc] = {
    import spark.implicits._
    spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "text").as[(String, String)].collect()
      .map { case (src, t) => OverlapStream.SourceDoc(src, t) }.toSeq
  }

  test("streamed-grown signatures serve the same estimates as the batch sketch") {
    assume(TestSpark.fixturesPresent, TestSpark.fixturesHint)
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = corpusDocs()
    val root = Files.createTempDirectory("ovstream").toString
    val in = MemoryStream[OverlapStream.SourceDoc]
    // three uneven micro-batches, sources interleaved across batches
    docs.grouped(docs.size / 3 + 1).foreach(b => in.addData(b))
    val q = OverlapStream.maintain(in.toDS(), root,
      Files.createTempDirectory("ov_ck").toString)
    try q.processAllAvailable() finally q.stop()

    val got = OverlapStream.estimates(spark, root)
      .as[(String, String, Long, Long, Long)].collect().toSet
    val want = Overlap.queries("corpus_overlap_minhash")(spark, sf)
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(got.nonEmpty && got === want)
  }

  test("replaying a batch is a no-op: merge is idempotent by algebra") {
    assume(TestSpark.fixturesPresent, TestSpark.fixturesHint)
    import spark.implicits._
    val docs = corpusDocs()
    val root = Files.createTempDirectory("ovreplay").toString
    val half = docs.take(docs.size / 2)
    OverlapStream.absorb(spark, root, half.toDF())
    OverlapStream.absorb(spark, root, docs.drop(docs.size / 2).toDF())
    val before = OverlapStream.estimates(spark, root).collect().toSet
    // replay the FIRST batch out of order, twice
    OverlapStream.absorb(spark, root, half.toDF())
    OverlapStream.absorb(spark, root, half.toDF())
    val after = OverlapStream.estimates(spark, root).collect().toSet
    assert(before === after)
  }
}
