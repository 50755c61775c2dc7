package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{BmStore, Retrieval}
import graft.streaming.BmServe

/** Online BM25 serving must agree exactly with the batch ranker: a
  * corpus-member query doc streamed through BmServe returns its
  * text_bm25_topk rows bit-for-bit, and an out-of-vocabulary query
  * returns nothing (unknown terms score nothing). The stream ≡ batch
  * proof for the retrieval family's retrospective-serving half
  * (Percolate covers the prospective half).
  */
class BmServeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("streamed corpus-member queries == batch text_bm25_topk rows") {
    assume(TestSpark.fixturesPresent, TestSpark.fixturesHint)
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = BmStore.ensureFullBuilt(spark, sf)
    // serve a subset of the standing query docs (ids 25, 100, 250) by
    // replaying their TEXT as serving requests
    val qids = Seq(25L, 100L, 250L)
    val reqs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(org.apache.spark.sql.functions.col("doc_id").isin(qids: _*))
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => BmServe.BmQuery(id, t) }.toSeq
    assert(reqs.size == qids.size)

    val answers = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    val in = MemoryStream[BmServe.BmQuery]
    in.addData(reqs)
    val q = BmServe.serve(in.toDS(), root,
      (df, _) => answers.synchronized { answers ++= df.collect().map(_.toSeq) })
    try q.processAllAvailable() finally q.stop()

    val want = Retrieval.queries("text_bm25_topk")(spark, sf)
      .filter(org.apache.spark.sql.functions.col("query_id").isin(qids: _*))
      .collect().map(_.toSeq)
    assert(want.nonEmpty)
    assert(answers.sortBy(_.toString).toSeq === want.sortBy(_.toString).toSeq)
  }

  test("out-of-vocabulary queries answer empty; the serve plan reads no documents") {
    assume(TestSpark.fixturesPresent, TestSpark.fixturesHint)
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = BmStore.ensureFullBuilt(spark, sf)
    var rows = -1L
    var scans: Seq[String] = Seq("unset")
    val in = MemoryStream[BmServe.BmQuery]
    in.addData(Seq(BmServe.BmQuery(900001L, "zzzunknown qqqterms onlyhere")))
    val q = BmServe.serve(in.toDS(), root, (df, _) => {
      rows = df.count()
      scans = TestSpark.executedScans(df)
        .map(_.relation.location.rootPaths.mkString(","))
    })
    try q.processAllAvailable() finally q.stop()
    assert(rows === 0L)
    // all frozen terms dropped -> the serve short-circuits before any scan
    // OR scans only store files; either way documents is never read
    assert(scans.forall(!_.contains("documents.parquet")))
  }
}
