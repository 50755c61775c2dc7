package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Tables

/** Temporal warehouse surface: SCD type-2 history derivation from a change
  * log, and calendar resampling with forward fill. Classic batch-warehouse
  * operators the PyFlink reference has no analog of (SURVEY.md §2
  * "operators the reference does NOT have") — both are staples of a
  * training-data / analytics pipeline's dimension- and time-series side.
  *
  * Scale notes (100 TB):
  *  - `q_scd2_history` is change-capture + interval construction in TWO
  *    window passes over ONE user-partitioned sort: the `lag` dedup filter
  *    preserves the sort order, so Catalyst satisfies the second window's
  *    requirement without a second exchange or sort (plan-checked in
  *    TemporalSpec). Shuffle count: exactly one, on the partition key —
  *    the minimum any per-key ordered derivation can do.
  *  - `q_resample_ffill` joins a GENERATED calendar grid (dates ×
  *    priorities — thousands of rows at any corpus scale) against
  *    pre-aggregated daily sums: the expensive side is reduced FIRST
  *    (map-side-combined groupBy), the grid side is broadcast, and the
  *    forward fill is `last(ignoreNulls)` over a rows-unbounded window on
  *    the tiny grid — never over raw facts. A naive formulation would
  *    window over the fact table; this one windows over O(calendar) rows.
  */
object Temporal {

  private def r2(c: Column): Column = round(c, 2)

  /** Epoch-day index of a naive timestamp column — bigint on both engines
    * (dtype-proof, like eventsNormalized's ts_ms convention).
    */
  private def epochDay(c: Column): Column =
    datediff(c.cast("date"), lit("1970-01-01").cast("date")).cast("long")

  /** Revenue threshold that makes daily (priority, day) cells sparse, so
    * the forward fill has real gaps to cross.
    */
  private val HighValue = 450000.0

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scd2_history" -> ((s, d) => {
      // SCD type-2 from an event log: treat each user's event_type as a
      // dimension state; collapse consecutive duplicates (change capture),
      // then each surviving row is valid [its ts, next change's ts) with
      // null valid_to marking the current version.
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ms"), col("event_id"))
      Tables.eventsNormalized(s, d)
        .select(col("user_id"), col("event_id"), col("ts_ms"), col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
        .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
        .withColumn("valid_to_ms", lead(col("ts_ms"), 1).over(byUser))
        .select(col("user_id"), col("event_type"),
          col("ts_ms").as("valid_from_ms"), col("valid_to_ms"),
          col("valid_to_ms").isNull.cast("int").as("is_current"))
    }),
    "q_resample_ffill" -> ((s, d) => {
      // Calendar resample + forward fill: dense (day × priority) grid over
      // the orders date span, left-joined to sparse high-value daily
      // revenue, gaps carried forward per priority (leading gaps → 0).
      val o = Tables.orders(s, d)
      val bounds = o.agg(min(epochDay(col("o_orderdate"))).as("lo"),
        max(epochDay(col("o_orderdate"))).as("hi"))
      val days = bounds.select(explode(expr("sequence(lo, hi)")).as("day_id"))
      val prio = o.select(col("o_orderpriority")).distinct()
      val daily = o.filter(col("o_totalprice") > HighValue)
        .groupBy(epochDay(col("o_orderdate")).as("day_id"), col("o_orderpriority"))
        .agg(r2(sum(col("o_totalprice"))).as("rev"))
      val byPrio = Window.partitionBy(col("o_orderpriority")).orderBy(col("day_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      days.crossJoin(prio)
        .join(daily, Seq("day_id", "o_orderpriority"), "left")
        .select(col("day_id"), col("o_orderpriority"),
          coalesce(last(col("rev"), ignoreNulls = true).over(byPrio), lit(0.0))
            .as("rev_ffill"),
          col("rev").isNull.cast("int").as("is_gap"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_scd2_history" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ms, event_type FROM events
        |), c AS (
        |  SELECT *, lag(event_type) OVER w AS prev_type
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)
        |), k AS (
        |  SELECT * FROM c WHERE prev_type IS NULL OR prev_type <> event_type
        |)
        |SELECT user_id, event_type, ms AS valid_from_ms,
        |  lead(ms) OVER w AS valid_to_ms,
        |  (lead(ms) OVER w IS NULL)::INT AS is_current
        |FROM k WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)""".stripMargin,
    "q_resample_ffill" ->
      s"""WITH od AS (
         |  SELECT CAST(datediff('day', DATE '1970-01-01', o_orderdate::DATE) AS BIGINT) AS day_id,
         |         o_orderpriority, o_totalprice
         |  FROM orders
         |), bounds AS (SELECT min(day_id) AS lo, max(day_id) AS hi FROM od),
         |days AS (SELECT unnest(generate_series(lo, hi)) AS day_id FROM bounds),
         |prio AS (SELECT DISTINCT o_orderpriority FROM od),
         |daily AS (
         |  SELECT day_id, o_orderpriority, round(sum(o_totalprice), 2) AS rev
         |  FROM od WHERE o_totalprice > $HighValue GROUP BY 1, 2
         |)
         |SELECT g.day_id, g.o_orderpriority,
         |  coalesce(last_value(daily.rev IGNORE NULLS) OVER (
         |    PARTITION BY g.o_orderpriority ORDER BY g.day_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS rev_ffill,
         |  (daily.rev IS NULL)::INT AS is_gap
         |FROM (SELECT day_id, o_orderpriority FROM days CROSS JOIN prio) g
         |LEFT JOIN daily USING (day_id, o_orderpriority)""".stripMargin
  )
}
