package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{BpeMerges, GraftFunctions}

/** Pins the deterministic BPE tokenizer's semantics on hand-traced words
  * (rule ORDER and per-rule replace-to-fixpoint both matter), so a merge-
  * table edit that silently changes counts fails here before the oracle.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def cnt(text: String): Long = {
    GraftFunctions.register(spark)
    spark.sql(s"SELECT bpe_token_count('$text') c").head().getLong(0)
  }

  test("golden word token counts (hand-traced through the merge list)") {
    assert(cnt("the") == 1L)      // t h → th;  th e → the
    assert(cnt("thing") == 2L)    // t h → th;  i n → in;  in g → ing
    assert(cnt("sting") == 2L)    // i n → in;  s t → st;  in g → ing
    assert(cnt("and") == 1L)      // a n → an;  an d → and
    assert(cnt("this") == 2L)     // t h → th;  i s → is
    assert(cnt("banana") == 4L)   // b | an | an | a  (a n twice, passes)
    assert(cnt("xyz") == 3L)      // no rule matches
    assert(cnt("") == 0L)         // empty word → zero tokens
  }

  test("per-rule fixpoint: boundary-sharing runs fully merge") {
    // " s t s t s t ": one replace pass leaves the middle pair unmerged
    // (its leading space was consumed by the first match) — the fixpoint
    // loop must close it to st|st|st
    assert(cnt("ststst") == 3L)
  }

  test("multi-word text sums per-word counts") {
    assert(cnt("the thing") == 3L)
    assert(cnt("the  thing") == 3L) // double space → empty word, 0 tokens
  }

  test("SQL fixpoint depth dominates worst corpus words") {
    // passes needed ≤ log2(len) + 1; guard the constant against a merge
    // table change that would need deeper nesting than the oracle applies
    assert(BpeMerges.SqlFixpointPasses >= 8)
  }
}
