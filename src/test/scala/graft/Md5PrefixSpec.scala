package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Md5PrefixLong / Md5PrefixLongArray (r21, the native portable-hash
  * prefix) vs the SQL chain they replaced —
  * `cast(conv(substring(md5(x), 1, n), 16, 10) as bigint)` — which
  * remains the DuckDB oracle form. Exact parity on the fixture corpus's
  * real shingles/tokens plus the seam cases (multibyte, empty string,
  * null elements, both registered widths).
  */
class Md5PrefixSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = TestSpark.spark
    graft.functions.GraftFunctions.register(s)
    s
  }
  private val sf = TestSpark.sf0001

  private def sqlForm(c: String, n: Int) =
    expr(s"cast(conv(substring(md5($c), 1, $n), 16, 10) as bigint)")

  test("md5_prefix8 / md5_prefix15 ≡ conv(substring(md5)) on corpus tokens") {
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(col("text"), " ")).as("t"))
    for (n <- Seq(8, 15)) {
      val bad = toks
        .select(sqlForm("t", n).as("a"), expr(s"md5_prefix$n(t)").as("b"))
        .filter(not(col("a") <=> col("b")))
        .count()
      assert(bad === 0L, s"width $n diverged from the SQL chain")
    }
  }

  test("seam cases: multibyte, empty, long strings") {
    import spark.implicits._
    val rows = Seq("", "a", "éöñ漢字🙂", "dsir:42", "x" * 10000,
      "tab\tand\nnewline", "0", " ").toDF("t")
    for (n <- Seq(8, 15)) {
      val bad = rows
        .select(sqlForm("t", n).as("a"), expr(s"md5_prefix$n(t)").as("b"))
        .filter(not(col("a") <=> col("b")))
        .count()
      assert(bad === 0L)
    }
  }

  test("md5_prefix15_array ≡ per-element lambda, null elements preserved") {
    import spark.implicits._
    val rows = Seq(
      Seq[String]("a", "b", "漢字"),
      Seq[String](),
      null.asInstanceOf[Seq[String]]
    ).toDF("arr")
      .union(Seq(Seq[String]("x", null, "z")).toDF("arr"))
    val bad = rows
      .select(
        expr("transform(arr, x -> cast(conv(substring(md5(x), 1, 15), 16, 10) as bigint))").as("a"),
        expr("md5_prefix15_array(arr)").as("b"))
      .filter(not(col("a") <=> col("b")))
      .count()
    assert(bad === 0L)
    // corpus shingles too
    graft.functions.GraftFunctions.register(spark)
    val sh = spark.read.parquet(s"$sf/documents.parquet")
      .select(expr("word_shingles(text)").as("arr"))
      .filter(col("arr").isNotNull)
    val badSh = sh
      .select(
        expr("transform(arr, x -> cast(conv(substring(md5(x), 1, 15), 16, 10) as bigint))").as("a"),
        expr("md5_prefix15_array(arr)").as("b"))
      .filter(not(col("a") <=> col("b")))
      .count()
    assert(badSh === 0L)
  }
}
