package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ContentWindows (r20, dedup_substring's native window sampler) vs the
  * retired pure-SQL transform/filter/array_distinct form it replaced —
  * exact parity on the real fixture corpus plus the seam cases (multibyte
  * codepoints, exactly-window-length, shorter-than-window, empty).
  */
class ContentWindowsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  private def sqlForm(win: Int, mod: Int): org.apache.spark.sql.Column = expr(
    s"""array_distinct(filter(
       |  transform(sequence(1, length(text) - ${win - 1}),
       |    i -> cast(conv(substring(md5(substring(text, i, $win)), 1, 8), 16, 10) as bigint)),
       |  h -> h % $mod = 0))""".stripMargin)

  private def nativeForm(win: Int, mod: Int): org.apache.spark.sql.Column = {
    graft.functions.ContentWindows.register(spark)
    expr(s"content_windows(text, $win, $mod)")
  }

  test("native sampler ≡ retired SQL form on the fixture corpus (40/4)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(length(col("text")) >= 40)
    val n = docs
      .select(col("doc_id"), sqlForm(40, 4).as("a"), nativeForm(40, 4).as("b"))
      .filter(not(col("a") <=> col("b")))
      .count()
    assert(n === 0L)
  }

  test("seam cases: multibyte, exact-length, repetitive") {
    import spark.implicits._
    // the SQL form is only defined behind the query's length >= winLen
    // filter (sequence(1, stop) runs DESCENDING for stop < 1), so the
    // parity domain mirrors the query: filtered rows only
    val rows = Seq(
      "héllo wörld ünïcode — ünïcode — ünïcode — ünïcode déjà vu ✓",
      "日本語のテキストですこれは四十文字を超える長さのテスト文字列になっています確認用",
      "x" * 40,           // exactly one window
      ("abc " * 20).trim  // repetitive → distinct collapses
    ).toDF("text").filter(length(col("text")) >= 40)
    val bad = rows
      .select(sqlForm(40, 4).as("a"), nativeForm(40, 4).as("b"))
      .filter(not(col("a") <=> col("b")))
      .count()
    assert(bad === 0L)
    // and at a second (winLen, mod) to pin the parameterization
    val bad2 = rows
      .select(sqlForm(12, 3).as("a"), nativeForm(12, 3).as("b"))
      .filter(not(col("a") <=> col("b")))
      .count()
    assert(bad2 === 0L)
  }

  test("below-window and empty inputs yield empty arrays (native)") {
    import spark.implicits._
    val out = Seq("x" * 39, "", "short").toDF("text")
      .select(size(nativeForm(40, 4)).as("n"))
      .collect().map(_.getInt(0)).toSeq
    assert(out === Seq(0, 0, 0))
  }
}
