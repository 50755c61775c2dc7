package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The sorted-merge intersection-count kernel behind the jaccard-prefix
  * two-stage verify: must equal size(array_intersect) on sorted
  * distinct-element arrays (string and long), and the 60-bit-fingerprint
  * screen built on it must never undercount a true intersection (the
  * superset-filter property the two-stage verify's losslessness rests
  * on).
  */
class SortedInterCountSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("equals size(array_intersect) on seeded random sorted arrays, both types") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (0 until 500).map { i =>
      val a = (0 until rnd.nextInt(60)).map(_ => rnd.nextInt(80)).distinct.sorted
      val b = (0 until rnd.nextInt(60)).map(_ => rnd.nextInt(80)).distinct.sorted
      (i, a.map(v => f"s$v%03d"), b.map(v => f"s$v%03d"),
        a.map(_.toLong), b.map(_.toLong))
    }
    val df = rows.toDF("id", "sa", "sb", "la", "lb")
      .withColumn("want_s", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("got_s", expr("sorted_inter_count(sa, sb)"))
      .withColumn("want_l", size(array_intersect(col("la"), col("lb"))))
      .withColumn("got_l", expr("sorted_inter_count(la, lb)"))
    val bad = df.filter(col("want_s") =!= col("got_s") ||
      col("want_l") =!= col("got_l")).count()
    assert(bad === 0)
    // non-vacuous: some rows intersect, some don't
    assert(df.filter(col("want_s") > 0).count() > 0)
    assert(df.filter(col("want_s") === 0).count() > 0)
  }

  test("fingerprint screen never undercounts: hash inter >= string inter") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 300).map { i =>
      val a = (0 until 50).map(_ => s"tok${rnd.nextInt(500)}").distinct.sorted
      val b = (0 until 50).map(_ => s"tok${rnd.nextInt(500)}").distinct.sorted
      (i, a, b)
    }
    val fp = "transform(%s, x -> cast(conv(substring(md5(x), 1, 15), 16, 10) as bigint))"
    val df = rows.toDF("id", "sa", "sb")
      .withColumn("inter_s", expr("sorted_inter_count(sa, sb)"))
      .withColumn("inter_h", expr(
        s"sorted_inter_count(array_sort(${fp.format("sa")}), array_sort(${fp.format("sb")}))"))
    assert(df.filter(col("inter_h") < col("inter_s")).count() === 0)
    // at 60 bits on these sizes the screen should in fact be exact
    assert(df.filter(col("inter_h") =!= col("inter_s")).count() === 0)
  }

  test("null elements are skipped, not NPE (general-session-function contract)") {
    // ADVICE r13: the function is registered for the whole session, so
    // arrays with null slots (containsNull = true — e.g. a raw
    // `array('a', NULL, 'c')` literal) must count nulls as matching
    // nothing. Note array_intersect DIFFERS here: it treats null==null
    // as a match when both sides hold a null, so the first case below
    // would be 3 under size(array_intersect); we deliberately skip nulls.
    graft.functions.GraftFunctions.register(spark)
    val df = spark.sql(
      """SELECT
        |  sorted_inter_count(array('a', NULL, 'c'), array('a', 'c', NULL)) s1,
        |  sorted_inter_count(array(CAST(NULL AS STRING), CAST(NULL AS STRING)), array('a')) s2,
        |  sorted_inter_count(array(CAST(NULL AS BIGINT), 1L, 3L), array(1L, 2L, 3L)) l1,
        |  sorted_inter_count(CAST(NULL AS ARRAY<STRING>), array('a')) n1
        |""".stripMargin).head()
    assert(df.getInt(0) === 2) // 'a' and 'c' match; nulls skipped
    assert(df.getInt(1) === 0)
    assert(df.getInt(2) === 2) // 1 and 3 match
    assert(df.isNullAt(3)) // null ARRAY stays null (nullSafeEval)
  }
}
