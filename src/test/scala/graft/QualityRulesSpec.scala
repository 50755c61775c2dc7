package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QualityRules

/** Gopher rule bundle vs a naive in-memory reimplementation on the real
  * sf0.001 fixture (with the query's own deterministic planting
  * replayed), plus non-vacuity: every rule must trip at least once and
  * pass at least once across the corpus.
  */
class QualityRulesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  private case class Stats(nWords: Long, nWordChars: Long, nSymbols: Long,
      nAlphaWords: Long, nStopHits: Long, nLines: Long, nBulletLines: Long,
      nEllipsisLines: Long)

  private def plant(id: Long, text: String): String =
    text +
      " ##" * (if (id % 7 == 0) 8 else 0) +
      " 123456" * (if (id % 11 == 0) 20 else 0) +
      " a" * (if (id % 17 == 0) 200 else 0) +
      (if (id % 3 == 0) "" else " the and of to") +
      "\n- bullet item" * (if (id % 5 == 0) 12 else 0) +
      "\ntrailing words..." * (if (id % 13 == 0) 2 else 0)

  private def naive(t: String): Stats = {
    val ws = t.split("\\s+", -1)
    val lines = t.split("\n", -1)
    def countOcc(s: String, sub: String): Int = {
      var c = 0; var i = s.indexOf(sub)
      while (i >= 0) { c += 1; i = s.indexOf(sub, i + sub.length) }
      c
    }
    Stats(
      nWords = ws.length,
      nWordChars = t.count(c => !c.isWhitespace),
      nSymbols = t.count(_ == '#') + countOcc(t, "..."),
      nAlphaWords = ws.count(_.exists(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))),
      nStopHits = QualityRules.StopWords.count(ws.contains),
      nLines = lines.length,
      nBulletLines = lines.count(l => l.startsWith("- ") || l.startsWith("* ")),
      nEllipsisLines = lines.count(_.endsWith("...")))
  }

  test("counts and verdicts match the naive rules on the planted corpus") {
    assume(TestSpark.fixturesPresent, TestSpark.fixturesHint)
    import spark.implicits._
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    val want = texts.map { case (id, t) => id -> naive(plant(id, t)) }.toMap
    val rows = QualityRules.queries("text_gopher_rules")(spark, sf).collect()
    assert(rows.length === want.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val w = want(id)
      val got = Stats(r.getAs[Long]("n_words"), r.getAs[Long]("n_word_chars"),
        r.getAs[Long]("n_symbols"), r.getAs[Long]("n_alpha_words"),
        r.getAs[Long]("n_stop_hits"), r.getAs[Long]("n_lines"),
        r.getAs[Long]("n_bullet_lines"), r.getAs[Long]("n_ellipsis_lines"))
      assert(got === w, s"doc $id")
      // verdicts re-derive from the integer stats
      assert(r.getAs[Boolean]("ok_word_count") === (w.nWords >= 50 && w.nWords <= 100000), s"doc $id")
      assert(r.getAs[Boolean]("ok_mean_word_len") ===
        (3 * w.nWords <= w.nWordChars && w.nWordChars <= 10 * w.nWords), s"doc $id")
      assert(r.getAs[Boolean]("ok_symbol_ratio") === (10 * w.nSymbols <= w.nWords), s"doc $id")
      assert(r.getAs[Boolean]("ok_alpha_words") === (5 * w.nAlphaWords >= 4 * w.nWords), s"doc $id")
      assert(r.getAs[Boolean]("ok_stopwords") === (w.nStopHits >= 2), s"doc $id")
      assert(r.getAs[Boolean]("ok_bullet_lines") === (10 * w.nBulletLines <= 9 * w.nLines), s"doc $id")
      assert(r.getAs[Boolean]("ok_ellipsis_lines") === (10 * w.nEllipsisLines <= 3 * w.nLines), s"doc $id")
    }
  }

  test("every rule is non-vacuous: trips and passes at least once") {
    assume(TestSpark.fixturesPresent, TestSpark.fixturesHint)
    val rows = QualityRules.queries("text_gopher_rules")(spark, sf).collect()
    val okCols = rows.head.schema.fieldNames.filter(_.startsWith("ok_")) :+ "pass"
    okCols.foreach { c =>
      val vs = rows.map(_.getAs[Boolean](c)).toSet
      assert(vs === Set(true, false), s"$c never varies")
    }
  }
}
