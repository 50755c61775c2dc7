package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Retrieval
import graft.streaming.Percolate

/** The streaming BM25 percolator must agree EXACTLY with the batch
  * scorer over the same frozen corpus — the house-style stream ≡ batch
  * equivalence proof for the retrieval family: replay a subset of the
  * real sf0.001 corpus as arrivals, score against stats frozen from the
  * full corpus, and require bit-identical (query_id, doc_id, n_terms,
  * sum_q) rows to the batch pipeline restricted to the same doc_ids.
  */
// top-level so the row encoder codegen can see a public constructor (an
// inner class trips Janino into interpreter fallback)
case class PercDocArrival(doc_id: Long, text: String)

class PercolateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  private type DocArrival = PercDocArrival
  private def DocArrival(id: Long, text: String) = PercDocArrival(id, text)

  test("streaming percolation == batch BM25 scores on replayed corpus docs") {
    assume(TestSpark.fixturesPresent, TestSpark.fixturesHint)
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // arrivals: an arbitrary corpus slice, INCLUDING one standing-query
    // doc (doc_id 25) so the self-exclusion path is exercised
    val arrivalIds = ((100L to 180L) :+ 25L).toSet
    val arrivals = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
      .filter(r => arrivalIds.contains(r._1))
      .map { case (id, t) => DocArrival(id, t) }.toSeq
    assert(arrivals.size == arrivalIds.size)

    val frozen = Retrieval.frozenStats(spark, sf)
    assert(frozen.queries.size == Retrieval.QueryDocIds.size)

    val in = MemoryStream[DocArrival]
    in.addData(arrivals)
    val q = Percolate.score(in.toDF(), frozen)
      .writeStream.format("memory").queryName("percolate")
      .outputMode("append").trigger(Trigger.Once())
      .option("checkpointLocation", Files.createTempDirectory("perc_ck").toString)
      .start()
    q.awaitTermination()
    val got = spark.table("percolate").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSet

    val exp = Retrieval.bmScored(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .filter(t => arrivalIds.contains(t._2)).toSet
    assert(exp.nonEmpty)
    // every arrival matched at least one standing query (shared vocab
    // corpus) and the standing-query arrival scored against OTHER
    // queries but never itself
    assert(exp.exists(_._2 == 25L) && !exp.exists(t => t._1 == 25L && t._2 == 25L))
    assert(got == exp,
      s"stream-only=${(got -- exp).take(5)}, batch-only=${(exp -- got).take(5)}")
  }

  test("inverted-index percolation == explode-every-query percolation, bit for bit") {
    assume(TestSpark.fixturesPresent, TestSpark.fixturesHint)
    // the full corpus replayed through BOTH formulations against the same
    // frozen stats: rows (incl. quantized sums) must match exactly — the
    // native inverted walk may only change COST, never a value. Batch
    // frames suffice (score/scoreIndexed are stream/batch-agnostic
    // projections; the streaming path is proven by the test above).
    val frozen = Retrieval.frozenStats(spark, sf)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    val want = Percolate.score(docs, frozen)
      .collect().map(_.toSeq).sortBy(_.toString)
    val got = Percolate.scoreIndexed(docs, frozen)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(want.nonEmpty && got.toSeq === want.toSeq)
  }

  test("inverted-index percolation matches at synthetic standing-query scale") {
    assume(TestSpark.fixturesPresent, TestSpark.fixturesHint)
    // Q=200 synthetic standing queries drawn from the index vocabulary
    // (the registration path a prospective-search user exercises): both
    // formulations again bit-identical, over queries that are NOT corpus
    // docs (no self-exclusion rows at all)
    val root = graft.operators.BmStore.ensureFullBuilt(spark, sf)
    val queries = graft.operators.BmStore
      .syntheticStandingQueries(spark, root, "q", 200)
    val frozen = graft.operators.BmStore.frozenStatsForQueries(spark, root, queries)
    assert(frozen.queries.size > 150) // most synthetic queries survive df lookup
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").limit(200)
    val want = Percolate.score(docs, frozen)
      .collect().map(_.toSeq).sortBy(_.toString)
    val got = Percolate.scoreIndexed(docs, frozen)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(want.nonEmpty && got.toSeq === want.toSeq)
  }

  test("an all-OOV standing set matches nothing in both formulations") {
    assume(TestSpark.fixturesPresent, TestSpark.fixturesHint)
    // every registered term misses the index vocabulary -> frozen.queries
    // is empty; score() emits zero rows via the empty literal, and
    // scoreIndexed() must do the same instead of failing to register an
    // empty-vocab expression (self-review r12)
    val root = graft.operators.BmStore.ensureFullBuilt(spark, sf)
    val frozen = graft.operators.BmStore.frozenStatsForQueries(spark, root,
      Seq((1L, Seq("zzzoov1", "zzzoov2")), (2L, Seq("zzzoov3"))))
    assert(frozen.queries.isEmpty)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").limit(20)
    assert(Percolate.score(docs, frozen).count() === 0L)
    assert(Percolate.scoreIndexed(docs, frozen).count() === 0L)
  }

  test("percolation is stateless: the streaming plan has no stateful operator") {
    assume(TestSpark.fixturesPresent, TestSpark.fixturesHint)
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val frozen = Retrieval.frozenStats(spark, sf)
    val in = MemoryStream[DocArrival]
    in.addData(DocArrival(9999L, "fast column table row"))
    val q = Percolate.score(in.toDF(), frozen)
      .writeStream.format("memory").queryName("percolate_plan")
      .outputMode("append").trigger(Trigger.Once())
      .option("checkpointLocation", Files.createTempDirectory("perc_pl").toString)
      .start()
    q.awaitTermination()
    // a stateless projection replays from source offsets alone: no state
    // store ever materializes. Non-vacuous: progress must exist.
    assert(q.recentProgress.nonEmpty)
    assert(q.recentProgress.forall(p =>
      p.stateOperators.forall(_.numRowsTotal == 0L)))
  }
}
