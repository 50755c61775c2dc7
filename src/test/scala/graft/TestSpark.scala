package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test JVM (suites run in a single
  * forked JVM; creating a session per suite wastes ~5 s each).
  */
object TestSpark {

  /** Root of the driver-generated parquet fixtures, resolvable on machines
    * where `/root/testdata` doesn't exist (ADVICE r11: the fixture-drift
    * tripwire should CANCEL with a clear message elsewhere, not hard-fail):
    * `-Dgraft.testdata=...` or `GRAFT_TESTDATA=...` override the default.
    */
  val testdataRoot: String =
    sys.props.get("graft.testdata")
      .orElse(sys.env.get("GRAFT_TESTDATA"))
      .getOrElse("/root/testdata")

  /** The sf0.001 fixture dir every spec reads. */
  val sf0001: String = s"$testdataRoot/sf0.001"

  /** True when the fixture root is present; specs that need it call
    * `assume(TestSpark.fixturesPresent, TestSpark.fixturesHint)` so an
    * absent root cancels with an actionable message instead of failing.
    */
  def fixturesPresent: Boolean = new java.io.File(sf0001).isDirectory
  val fixturesHint: String =
    s"testdata not found at $sf0001 — point GRAFT_TESTDATA (or -Dgraft.testdata) at the fixture root"

  lazy val spark: SparkSession = {
    val s = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
