package graft

import org.scalatest.funsuite.AnyFunSuite

/** Tripwire for fixture drift: every registered `SparkEntry.queries` entry
  * must at least ANALYZE against the driver's real sf0.001 parquet testdata.
  *
  * Round 9 shipped a snapshot where a regenerated `events.parquet` (physical
  * type ns → µs) made 18 of 127 registered queries fail at plan time with no
  * red signal in `sbt test`, because every other spec builds its own
  * fixtures. This spec reads the REAL files, so a schema/dtype change in
  * `/root/testdata` fails the suite in seconds instead of silently shrinking
  * the oracle gate.
  *
  * `.columns` forces analysis only — no job runs unless a builder is
  * itself eager (model fits at sf0.001 are sub-second). Failures accumulate
  * so one broken loader reports the full blast radius, not just the first
  * query hit.
  */
class QuerySurfaceSpec extends AnyFunSuite {
  private val sf = TestSpark.sf0001

  test("every registered query analyzes against the shipped sf0.001 testdata") {
    // absent fixtures (a dev machine without the driver's testdata) cancel
    // with a pointer at the override instead of hard-failing the tripwire
    assume(TestSpark.fixturesPresent, TestSpark.fixturesHint)
    val spark = TestSpark.spark
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, build) =>
      try {
        val cols = build(spark, sf).columns
        if (cols.isEmpty) Some(s"$name: analyzed but produced zero columns") else None
      } catch {
        case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" | ")}")
      }
    }
    assert(
      failures.isEmpty,
      s"\n${failures.size} of ${SparkEntry.queries.size} registered queries failed analysis on $sf:\n  " +
        failures.mkString("\n  ")
    )
  }
}
