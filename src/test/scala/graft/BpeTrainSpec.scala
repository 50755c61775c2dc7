package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BpeTrain

/** The BPE merge trainer must behave like the published recipe: greedy
  * highest-count pair per round, later rules allowed to reference
  * symbols formed by earlier ones, counts non-increasing in a fixed
  * corpus region, and the learned list must actually COMPRESS the
  * corpus when applied with the family's shared replace semantics.
  */
class BpeTrainSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  private lazy val rules =
    BpeTrain.queries("bpe_train_merges")(spark, sf)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)

  test("greedy structure: dense ranks, positive counts, merged = pair glued") {
    assume(TestSpark.fixturesPresent, TestSpark.fixturesHint)
    assert(rules.map(_._1).toSeq === (1 to BpeTrain.TrainMerges))
    rules.foreach { case (r, pair, merged, freq) =>
      assert(freq > 0, s"rank $r")
      assert(pair.split(" ").length === 2, s"rank $r: '$pair'")
      assert(merged === pair.replace(" ", ""), s"rank $r")
    }
    // no rule learned twice
    assert(rules.map(_._2).distinct.length === rules.length)
  }

  test("later rules build on earlier symbols (the real BPE structure)") {
    assume(TestSpark.fixturesPresent, TestSpark.fixturesHint)
    // at least one learned pair has a side that is itself an earlier
    // merge result (e.g. "p ar" after "a r") — the property that
    // distinguishes BPE from a one-shot bigram count
    val merged = rules.map(_._3).toSet
    val composite = rules.exists { case (_, pair, _, _) =>
      pair.split(" ").exists(side => side.length > 1 && merged.contains(side))
    }
    assert(composite, s"no composite rule in ${rules.map(_._2).mkString(", ")}")
  }

  test("toy dictionary: known greedy trace, exact tie-break") {
    // "aaab"×3 + "ab"×2: round 1 pairs = {a a: 6, a b: 5}; after "a a"
    // -> [aa,a,b]x3: round 2 = {aa a: 3, a b: 5} -> "a b" wins; round 3
    // = {aa ab: 3} (ties broken lexicographically when equal)
    val rules = BpeTrain.trainRules(Array(("aaab", 3L), ("ab", 2L)))
    assert(rules.take(3).map(r => (r._2, r._4)).toSeq ===
      Seq(("a a", 6L), ("a b", 5L), ("aa ab", 3L)))
  }

  test("applying the learned rules compresses the corpus") {
    assume(TestSpark.fixturesPresent, TestSpark.fixturesHint)
    import spark.implicits._
    // token count under the learned merges < raw char count, and the
    // application uses the SAME spaced-string replace semantics the
    // trainer froze (so this is an end-to-end train->apply check)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").as[String].take(50)
    val learned = rules.map(r => (" " + r._2 + " ", " " + r._3 + " "))
    var chars = 0L
    var toks = 0L
    docs.foreach { text =>
      text.split(" ", -1).filter(_.nonEmpty).foreach { w =>
        chars += w.length
        var sp = " " + w.replaceAll("(?s)(.)", "$1 ")
        learned.foreach { case (pat, rep) =>
          (1 to graft.functions.BpeMerges.SqlFixpointPasses)
            .foreach(_ => sp = sp.replace(pat, rep))
        }
        toks += sp.trim.split(" ").length
      }
    }
    assert(toks < chars, s"$toks tokens vs $chars chars")
    assert(toks > 0)
  }
}
