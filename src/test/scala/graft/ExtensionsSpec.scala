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
}
