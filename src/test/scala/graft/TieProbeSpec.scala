package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the closed-form halves of [[TieProbe]] (r20, VERDICT r19 #1):
  * the hybrid-RRF and curriculum-rate rounds stay on plain `round`
  * because their COMPLETE input domains (not samples) keep every
  * reachable pre-round value far from a decimal half-way boundary —
  * if a constant changes (RrfK, FuseDepth, the band count) and shrinks
  * the margin below the cross-libm double-jitter envelope, this spec
  * fails before the oracle ever could.
  */
class TieProbeSpec extends AnyFunSuite {

  // ~1e-9 is the generous upper bound on |spark - duckdb| evaluation
  // jitter at 1e6 scale (1-ulp libm differences on O(0.1) values);
  // demand 1000x that margin.
  private val SafeMargin = 1e-6

  test("hybrid RRF: exhaustive rank-domain min tie-distance is provably safe") {
    val (minDist, at) = TieProbe.rrfDomainMin()
    assert(minDist > SafeMargin, s"RRF tie margin collapsed at $at")
    // freeze the current domain's answer so a silent RrfK/FuseDepth edit
    // that reshuffles the margin is visible in review, not just green
    assert(math.abs(minDist - 0.002262443) < 1e-9, s"domain changed: $minDist at $at")
  }

  test("curriculum rate: all 10 bands land exactly between boundaries") {
    assert(TieProbe.curriculumDomainMin() === 0.5)
  }

  test("tieDistance measures what the engines disagree about") {
    // the r19 quality_score tie: 0.62345 at scale 4 sits exactly on the
    // …5 boundary (distance 0) — the case ExactRound now handles in
    // integer space; a safely-off value measures its true margin
    assert(TieProbe.tieDistance(0.62345, 4) < 1e-9)
    assert(math.abs(TieProbe.tieDistance(0.6234, 4) - 0.5) < 1e-9)
  }

  test("measured mixture columns stay off every tie at the fixture scale") {
    assume(TestSpark.fixturesPresent, TestSpark.fixturesHint)
    val rows = TieProbe.probeDir(TestSpark.spark, TestSpark.sf0001)
    assert(rows.nonEmpty)
    rows.foreach { case (colName, sc, lang, pre, dist) =>
      assert(dist > SafeMargin,
        s"$colName (scale $sc) within tie margin at lang=$lang pre=$pre")
    }
  }
}
