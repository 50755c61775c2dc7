package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** WordGrams (r21, text_bigram_logprob's native bigram stream) vs the
  * zip_with-over-split form it replaced — exact parity on the fixture
  * corpus plus the seam cases (single word, empty string, consecutive /
  * leading / trailing spaces).
  */
class WordGramsSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = TestSpark.spark
    graft.functions.GraftFunctions.register(s)
    s
  }
  private val sf = TestSpark.sf0001

  // the retired SQL form: adjacent (w1, w2) pairs of split(text, ' '),
  // defined only behind the size >= 2 filter; joined here with ' ' so the
  // two forms compare as the same encoding
  private val sqlForm = expr(
    """CASE WHEN size(split(text, ' ')) >= 2 THEN
      |  zip_with(slice(split(text, ' '), 1, size(split(text, ' ')) - 1),
      |           slice(split(text, ' '), 2, size(split(text, ' ')) - 1),
      |           (a, b) -> concat(a, ' ', b))
      |ELSE NULL END""".stripMargin)

  test("word_bigrams ≡ zip_with over split on the fixture corpus") {
    val bad = spark.read.parquet(s"$sf/documents.parquet")
      .select(sqlForm.as("a"), expr("word_bigrams(text)").as("b"))
      .filter(not(col("a") <=> col("b")))
      .count()
    assert(bad === 0L)
  }

  test("seam cases: short, empty, repeated and edge spaces") {
    import spark.implicits._
    val rows = Seq("", "one", "a b", "a b c", "a  b", " a b", "a b ",
      " ", "  ", "é ö 漢").toDF("text")
    val bad = rows
      .select(col("text"), sqlForm.as("a"), expr("word_bigrams(text)").as("b"))
      .filter(not(col("a") <=> col("b")))
      .collect()
    assert(bad.isEmpty, bad.mkString("; "))
  }
}
