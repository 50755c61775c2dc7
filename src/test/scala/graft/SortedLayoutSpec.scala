package graft

import java.time.{LocalDateTime, ZoneOffset}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout
import graft.sources.Tables

/** The range-clustered (zone-map) layout lever: after
  * `repartitionByRange(l_shipdate) + sortWithinPartitions`, each parquet
  * row group covers a narrow disjoint shipdate span, so the footer min/max
  * statistics alone answer "which row groups can contain 1995-06..08?".
  * The spec checks that claim against the footers themselves — not wall
  * time — because the statistics are exactly what the reader's row-group
  * filter consumes at any scale.
  */
class SortedLayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  private def micros(dt: LocalDateTime): Long =
    dt.toInstant(ZoneOffset.UTC).toEpochMilli * 1000L

  test("sorted layout: row-group min/max spans are disjoint and prune the range") {
    val dir = Layout.ensureSorted(spark, sf)
    val spans = ParquetFooters.spans(dir, "l_shipdate").sortBy(_._1)
    assert(spans.size >= Layout.SortedFiles - 2,
      s"expected ~${Layout.SortedFiles} row groups, got ${spans.size}")

    // clustering ⇒ spans are pairwise non-overlapping (range partitioner
    // boundaries); equal boundary values may touch, never interleave
    spans.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) =>
        assert(aMax <= bMin, s"overlapping clustered spans: $spans")
      case _ =>
    }

    // the registered query's 3-month window intersects ≤2 of the ~8 spans:
    // everything else is skipped from the footer alone
    val (lo, hi) = (micros(LocalDateTime.of(1995, 6, 1, 0, 0)),
      micros(LocalDateTime.of(1995, 9, 1, 0, 0)))
    val touched = spans.count { case (mn, mx) => mx >= lo && mn < hi }
    assert(touched >= 1 && touched <= 2,
      s"range-clustered layout should localize the window, touched=$touched of ${spans.size}")
  }

  test("q_sorted_layout_prune pushes the range predicate and matches the plain table") {
    val q = Layout.queries("q_sorted_layout_prune")(spark, sf)
    val plan = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"),
      s"range predicate should reach the parquet scan:\n$plan")

    val expect = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1995-06-01").cast("timestamp") &&
        col("l_shipdate") < lit("1995-09-01").cast("timestamp"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("revenue"))
      .collect().map(_.toSeq).toSet
    assert(q.collect().map(_.toSeq).toSet == expect && expect.nonEmpty)
  }
}
