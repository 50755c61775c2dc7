package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** dedup_eval_minhash grades the banding stage against exact ground truth.
  * The driver corpus' duplicates are exact (j=1 ⇒ every band matches, so
  * prec=rec=1 there); this spec builds a corpus of TRUE NEAR-dups
  * (j≈0.818: 22 words, last 2 replaced ⇒ 18 of 22 shingles shared) where
  * the 4×4 banding provably loses some pairs — the regime the metric
  * exists for. Everything is deterministic: fixed vocab, fixed hash
  * constants.
  */
class MinhashEvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("banding recall is measurably < 1 on a true near-dup corpus") {
    import spark.implicits._
    val docs = (0 until 60).flatMap { p =>
      val words = (0 until 22).map(k => s"p${p}w$k")
      val base = words.mkString(" ")
      val variant = (words.dropRight(2) ++ Seq(s"p${p}x0", s"p${p}x1")).mkString(" ")
      Seq((2L * p, base, "en", "synself", base.length.toLong),
        (2L * p + 1, variant, "en", "synself", variant.length.toLong))
    }
    val dir = Files.createTempDirectory("mh_eval").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")

    val r = Dedup.queries("dedup_eval_minhash")(spark, dir).head()
    val (nTruth, nCand, nHit) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val (prec, rec) = (r.getDouble(3), r.getDouble(4))

    assert(nTruth == 60, s"every constructed pair is a true near-dup: $nTruth")
    assert(nHit <= nCand && nHit <= nTruth)
    assert(rec == math.round(nHit.toDouble / nTruth * 10000) / 10000.0)
    // j=0.818 ⇒ P(pair survives 4x4 banding) ≈ 0.9: some pairs MUST slip
    assert(rec < 1.0 && rec > 0.5,
      s"banding at j≈0.82 should lose some but not most pairs: rec=$rec")
    assert(prec > 0.9, s"random band collisions should be rare: prec=$prec")
  }
}
