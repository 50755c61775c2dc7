package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Overlap

/** Cross-source overlap vs a naive in-memory reimplementation on the
  * real sf0.001 fixture, plus the property the sketch's scale story
  * rests on: signatures are mergeable (sig(A ∪ B) = element-wise min of
  * sig(A), sig(B)).
  */
class OverlapSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  private val P = 2147483647L
  private def md5Int8(s: String): Long =
    graft.functions.PortableHash.md5Int8(s)
  private val hashA = (0 until Overlap.NumHashes).map(i => 1L + md5Int8(s"ova:$i") % (P - 1))
  private val hashB = (0 until Overlap.NumHashes).map(i => md5Int8(s"ovb:$i") % P)

  /** source -> distinct shingle-hash set (the shared universe). */
  private lazy val srcSets: Map[String, Set[Long]] = {
    import spark.implicits._
    spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "text").as[(String, String)].collect()
      .flatMap { case (src, t) =>
        val ws = t.split(" ", -1)
        ws.sliding(3).filter(_.length == 3)
          .map(g => src -> md5Int8(g.mkString(" ")) % P)
      }
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).toSet }
  }

  private def sig(hs: Set[Long]): IndexedSeq[Long] =
    (0 until Overlap.NumHashes).map(i => hs.map(h => (hashA(i) * h + hashB(i)) % P).min)

  private def pairs: Seq[(String, String)] = {
    val ss = srcSets.keys.toSeq.sorted
    for (a <- ss; b <- ss if a < b) yield (a, b)
  }

  test("exact pairwise jaccard matches the naive set computation") {
    assume(TestSpark.fixturesPresent, TestSpark.fixturesHint)
    import spark.implicits._
    val got = Overlap.queries("corpus_overlap_exact")(spark, sf)
      .select("source_a", "source_b", "n_inter", "n_union", "jaccard_bp")
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    val want = pairs.map { case (a, b) =>
      val ni = srcSets(a).intersect(srcSets(b)).size.toLong
      val nu = srcSets(a).union(srcSets(b)).size.toLong
      (a, b) -> ((ni, nu, ni * 10000 / nu))
    }.toMap
    assert(got === want)
    assert(got.values.exists(_._1 > 0), "no overlapping source pair — vacuous corpus")
  }

  test("minhash estimate matches the naive signature comparison") {
    assume(TestSpark.fixturesPresent, TestSpark.fixturesHint)
    import spark.implicits._
    val sigs = srcSets.map { case (s, hs) => s -> sig(hs) }
    val got = Overlap.queries("corpus_overlap_minhash")(spark, sf)
      .select("source_a", "source_b", "n_match")
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val want = pairs.map { case (a, b) =>
      (a, b) -> (0 until Overlap.NumHashes).count(i => sigs(a)(i) == sigs(b)(i)).toLong
    }.toMap
    assert(got === want)
  }

  test("signatures merge: sig(A union B) == elementwise min of the two sigs") {
    assume(TestSpark.fixturesPresent, TestSpark.fixturesHint)
    val ss = srcSets.keys.toSeq.sorted
    for (Seq(a, b) <- ss.take(6).sliding(2)) {
      val merged = sig(srcSets(a) ++ srcSets(b))
      val mins = sig(srcSets(a)).zip(sig(srcSets(b))).map { case (x, y) => math.min(x, y) }
      assert(merged === mins, s"$a + $b")
    }
  }
}
