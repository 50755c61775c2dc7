package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dsir

/** DSIR importance resampling vs a naive in-memory reimplementation on
  * the real sf0.001 fixture: the bucket model, per-doc weights, and the
  * Gumbel-top-k sample must all match exactly (every number is a
  * quantized long by construction, so "exactly" means ===).
  */
class DsirSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  private def md5Int8(s: String): Long =
    graft.functions.PortableHash.md5Int8(s)

  private case class Doc(id: Long, source: String, tokens: Array[String])

  private lazy val docs: Seq[Doc] = {
    import spark.implicits._
    spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "text").as[(Long, String, String)].collect()
      .map { case (id, src, t) => Doc(id, src, t.split(" ", -1)) }.toSeq
  }

  private def bucket(tok: String): Int = (md5Int8(tok) % Dsir.Buckets).toInt

  /** (lam per bucket, per-candidate-doc (n_tokens, sum_lam)) */
  private lazy val naive: (Array[Long], Map[Long, (Long, Long)]) = {
    val ct = new Array[Long](Dsir.Buckets)
    val cr = new Array[Long](Dsir.Buckets)
    val tgt = Dsir.TargetSources.toSet
    docs.foreach { d =>
      val c = if (tgt(d.source)) ct else cr
      d.tokens.foreach(t => c(bucket(t)) += 1)
    }
    val tTot = ct.sum.toDouble
    val rTot = cr.sum.toDouble
    val lam = Array.tabulate(Dsir.Buckets) { b =>
      math.round((math.log((ct(b) + 1.0) / (tTot + Dsir.Buckets)) -
        math.log((cr(b) + 1.0) / (rTot + Dsir.Buckets))) * 1e6)
    }
    val w = docs.filterNot(d => tgt(d.source)).map { d =>
      d.id -> ((d.tokens.length.toLong, d.tokens.map(t => lam(bucket(t))).sum))
    }.toMap
    (lam, w)
  }

  test("bucket log-ratio model matches the naive fit (full 256-bucket domain)") {
    assume(TestSpark.fixturesPresent, TestSpark.fixturesHint)
    import spark.implicits._
    val got = Dsir.queries("dsir_logratio")(spark, sf)
      .select("bucket", "lam").as[(Long, Long)].collect().toMap
    assert(got.size === Dsir.Buckets)
    val (lam, _) = naive
    (0 until Dsir.Buckets).foreach(b => assert(got(b.toLong) === lam(b), s"bucket $b"))
  }

  test("per-doc weights match and exclude the target sources") {
    assume(TestSpark.fixturesPresent, TestSpark.fixturesHint)
    import spark.implicits._
    val got = Dsir.queries("dsir_weights")(spark, sf)
      .select("doc_id", "n_tokens", "sum_lam").as[(Long, Long, Long)].collect()
      .map { case (id, n, q) => id -> ((n, q)) }.toMap
    val (_, w) = naive
    assert(got === w)
    // weights must actually separate: the score varies across docs
    assert(got.values.map(_._2).toSet.size > 1)
  }

  test("gumbel top-k sample is the naive top-k, deterministic, candidates only") {
    assume(TestSpark.fixturesPresent, TestSpark.fixturesHint)
    import spark.implicits._
    val (_, w) = naive
    def gumbel(id: Long): Long = {
      val u = (md5Int8(s"dsir:$id") + 0.5) / 4294967296.0
      math.round(-math.log(-math.log(u)) * 1e6)
    }
    val want = w.toSeq
      .map { case (id, (_, sumLam)) => (id, sumLam + gumbel(id)) }
      .sortBy { case (id, s) => (-s, id) }.take(Dsir.SampleK)
    val got = Dsir.queries("dsir_sample")(spark, sf)
      .select("doc_id", "score_q").as[(Long, Long)].collect().toSeq
      .sortBy { case (id, s) => (-s, id) }
    assert(got.size === Dsir.SampleK)
    assert(got === want)
    // a second evaluation returns the identical set (pure hash noise)
    val again = Dsir.queries("dsir_sample")(spark, sf)
      .select("doc_id").as[Long].collect().toSet
    assert(again === got.map(_._1).toSet)
  }
}
