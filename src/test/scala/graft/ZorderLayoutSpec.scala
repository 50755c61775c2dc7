package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout
import graft.sources.Tables

/** The z-order layout's contract: ONE clustered copy prunes range scans on
  * EITHER of its two dimensions (a middle band on one dimension touches a
  * strict subset of row groups), where the single-column sorted layout
  * prunes perfectly on its own column and not at all on the other. All
  * claims measured from the parquet footer statistics, not wall time.
  */
class ZorderLayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  // middle ~10% band of a column's observed domain
  private def band(lo: Long, hi: Long): (Long, Long) = {
    val w = hi - lo
    (lo + (w * 0.45).toLong, lo + (w * 0.55).toLong)
  }

  test("z-order prunes middle-band scans on BOTH dimensions; sorted layout only on its own") {
    val zDir = Layout.ensureZordered(spark, sf)
    val sDir = Layout.ensureSorted(spark, sf)

    val li = Tables.lineitem(spark, sf)
    val r = li.agg(
      min("l_partkey"), max("l_partkey"),
      min(unix_micros(col("l_shipdate").cast("timestamp"))),
      max(unix_micros(col("l_shipdate").cast("timestamp")))).head()
    val (pLo, pHi) = band(r.getLong(0), r.getLong(1))
    val (dLo, dHi) = band(r.getLong(2), r.getLong(3))

    val zPart = ParquetFooters.spans(zDir, "l_partkey")
    val zDate = ParquetFooters.spans(zDir, "l_shipdate")
    assert(zPart.size >= Layout.ZFiles - 4, s"row groups: ${zPart.size}")

    val zTouchedP = ParquetFooters.touched(zPart, pLo, pHi)
    val zTouchedD = ParquetFooters.touched(zDate, dLo, dHi)
    // a ~10% band over a 4x4 z-grid should localize to ~a quarter of the
    // groups; ≤75% keeps the assertion robust to boundary straddle
    assert(zTouchedP <= zPart.size * 3 / 4,
      s"partkey band touched $zTouchedP of ${zPart.size} z-ordered groups")
    assert(zTouchedD <= zDate.size * 3 / 4,
      s"shipdate band touched $zTouchedD of ${zDate.size} z-ordered groups")

    // the shipdate-sorted layout: near-perfect on shipdate, useless on
    // partkey (every file spans ~the whole partkey domain)
    val sPart = ParquetFooters.spans(sDir, "l_partkey")
    val sDate = ParquetFooters.spans(sDir, "l_shipdate")
    assert(ParquetFooters.touched(sDate, dLo, dHi) <= 2)
    assert(ParquetFooters.touched(sPart, pLo, pHi) >= sPart.size - 1,
      "a single-column sort should NOT prune the other dimension")
  }

  test("q_zorder_prune matches the plain table and pushes both predicates") {
    val q = Layout.queries("q_zorder_prune")(spark, sf)
    val plan = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters") && plan.contains("l_partkey")
      && plan.contains("l_shipdate"), s"both predicates should reach the scan:\n$plan")

    val expect = Tables.lineitem(spark, sf)
      .filter(col("l_partkey") >= 40 && col("l_partkey") <= 90 &&
        col("l_shipdate") >= lit("1994-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .groupBy("l_linestatus")
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
      .collect().map(_.toSeq).toSet
    assert(q.collect().map(_.toSeq).toSet == expect && expect.nonEmpty)
  }
}
