package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Temporal

/** Scale-shape assertions for the temporal operators: the SCD2 derivation
  * must cost exactly ONE shuffle (both window passes share the
  * user-partitioned sort; the change-capture filter preserves order), and
  * the resample grid must be dense and windowed over O(calendar) rows.
  */
class TemporalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("q_scd2_history: both window passes share one exchange and one sort") {
    val df = Temporal.queries("q_scd2_history")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    val sorts = "\\bSort \\[".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 shuffle, got $exchanges:\n$plan")
    assert(sorts == 1, s"expected 1 sort, got $sorts:\n$plan")
  }

  test("q_scd2_history: intervals chain per user and end open") {
    val rows = Temporal.queries("q_scd2_history")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), if (r.isNullAt(3)) Long.MaxValue else r.getLong(3)))
    val byUser = rows.groupBy(_._1)
    byUser.foreach { case (u, vs) =>
      val sorted = vs.sortBy(_._3)
      // consecutive versions abut exactly and never repeat a state
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 == b._3, s"user $u: gap/overlap between versions")
          assert(a._2 != b._2, s"user $u: un-collapsed duplicate state")
        case _ =>
      }
      assert(sorted.last._4 == Long.MaxValue, s"user $u: no open current row")
      assert(sorted.init.forall(_._4 != Long.MaxValue))
    }
  }

  test("q_resample_ffill: dense grid, gaps carried forward") {
    val df = Temporal.queries("q_resample_ffill")(spark, sf)
    val rows = df.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3)))
    val prios = rows.map(_._2).distinct
    val days = rows.map(_._1).distinct
    assert(rows.length == prios.length * days.length, "grid must be dense")
    assert((days.min to days.max).size == days.length, "no calendar holes")
    // forward fill: on a gap day the value equals the previous day's value
    rows.groupBy(_._2).foreach { case (_, vs) =>
      val sorted = vs.sortBy(_._1)
      sorted.sliding(2).foreach {
        case Array(a, b) if b._4 == 1 => assert(b._3 == a._3)
        case _ =>
      }
      // leading gap rows are zero-filled
      sorted.takeWhile(_._4 == 1).foreach(v => assert(v._3 == 0.0))
    }
    assert(rows.exists(_._4 == 1) && rows.exists(_._4 == 0))
  }
}
