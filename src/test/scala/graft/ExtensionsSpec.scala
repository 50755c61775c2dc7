package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** A session created with spark.sql.extensions=GraftExtensions resolves
  * the graft function family in plain SQL, no programmatic registration.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("extension-injected functions resolve in SQL") {
    // Force the shared test context up first so we reuse its SparkContext.
    // `spark.sql.extensions` is a static conf read at SparkContext creation,
    // so in this shared-context JVM we exercise the same injection through
    // builder.withExtensions — what Spark itself calls for each class named
    // in the conf.
    val base = TestSpark.spark
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.functions.GraftExtensions())
        .getOrCreate()
      val row = s.sql(
        """SELECT dot_double(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dot,
          |       rolling_hash('abc') AS rh,
          |       size(word_shingles('a b c d')) AS ns,
          |       simhash48('a b') AS sh""".stripMargin).head()
      assert(row.getDouble(0) == 11.0)
      assert(row.getLong(1) != 0L)
      assert(row.getInt(2) == 2)
      assert(row.getLong(3) >= 0L)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("registerPq content-address folds codebook shape, not just values") {
    val s = TestSpark.spark
    // same flattened doubles, different geometry: 1 codebook × 2 codewords
    // vs 2 codebooks × 1 codeword — must NOT collide to one function name
    val a = Array(Array(Array(1.0), Array(2.0)))
    val b = Array(Array(Array(1.0)), Array(Array(2.0)))
    assert(graft.functions.GraftFunctions.registerPq(s, a) !=
      graft.functions.GraftFunctions.registerPq(s, b))
  }

  test("buildBloom: content-addressed per config, clear error on empty build side") {
    val s = TestSpark.spark
    import s.implicits._
    val df = Seq(1L, 2L, 3L).toDF("k")
    val bloom = graft.functions.GraftFunctions.buildBloom(df, "k", 100L, 1024L)
    assert(bloom.nonEmpty)
    // a second config in the same session binds its own function name —
    // the two builds cannot rebind each other
    val bloom2 = graft.functions.GraftFunctions.buildBloom(df, "k", 200L, 2048L)
    assert(bloom2.length != bloom.length || !bloom2.sameElements(bloom))
    val ex = intercept[IllegalArgumentException] {
      graft.functions.GraftFunctions.buildBloom(df.filter("k < 0"), "k", 100L, 1024L)
    }
    assert(ex.getMessage.contains("no rows"))
  }
}
