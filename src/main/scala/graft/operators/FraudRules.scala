package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.model.FraudConstants._

/** Batch formulation of the reference's fraud rules
  * (flink/fraud_detection.py:75-128) as declarative Catalyst plans:
  *
  *  - HIGH_AMOUNT: `amount > 200` → +40 (fraud_detection.py:87-88)
  *  - RAPID_TRANSACTIONS: ≥N events per key within a trailing 10 s
  *    event-time window (incl. the current event) → +30 — the reference's
  *    hand-rolled state prune (fraud_detection.py:90-96) is exactly a
  *    `RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW` count when events are
  *    folded in event-time order (SURVEY.md §7.4 fixes event-time order as
  *    canonical).
  *  - IMPOSSIBLE_TRAVEL: previous event for the key exists, different
  *    location, gap ≤ 120 s, both locations in the 5-city table, haversine
  *    > 500 km → +50 (fraud_detection.py:98-111) — `lag` over the same
  *    key partitioning.
  *
  * Everything is built-in `functions._` (whole-stage-codegen'd); the two
  * window specs share one hash partitioning on the key so Catalyst plans a
  * single exchange. No UDFs, no custom expressions needed (SURVEY.md §7.3).
  */
object FraudRules {

  /** Great-circle distance in km (flink/fraud_detection.py:38-51) as a pure
    * column expression — same formula, codegen-friendly, no UDF.
    */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dlat = radians(lat2 - lat1)
    val dlon = radians(lon2 - lon1)
    val x = pow(sin(dlat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dlon / 2), 2)
    lit(2 * EarthRadiusKm) * atan2(sqrt(x), sqrt(lit(1) - x))
  }

  /** Latitude for a 2-letter location code; null when not in the 5-city
    * table (which disables the travel rule, matching the
    * `location in LOCATION_COORDS` guard at fraud_detection.py:105-106).
    * A literal CASE stays inside codegen and — unlike a join — costs nothing
    * at 100 TB; the table is 5 constant rows.
    */
  def latFor(loc: Column): Column = coordCase(loc, _._1)
  def lonFor(loc: Column): Column = coordCase(loc, _._2)

  private def coordCase(loc: Column, pick: ((Double, Double)) => Double): Column =
    LocationCoords.foldLeft(lit(null).cast("double")) { case (acc, (code, c)) =>
      when(loc === code, lit(pick(c))).otherwise(acc)
    }

  /** Append rule/score/status columns to any keyed event frame.
    *
    * @param df        input with at least (key, millis, amount, location)
    * @param key       grouping key column name (card_id analogue)
    * @param millis    event-time epoch-millis column (LongType)
    * @param amount    transaction amount (DoubleType)
    * @param location  2-letter location code
    * @param tieBreak  deterministic order tiebreaker within equal millis
    * @param rapidCount velocity threshold: 3 (v1) or 20 (v2)
    *
    * Adds: rule_high_amount / rule_rapid / rule_travel (boolean),
    * score (int), status, severity, reasons (comma-joined, rule order as in
    * flink/fraud_detector_TAG.py:89,98,114).
    */
  def withScores(
      df: DataFrame,
      key: String = "card_id",
      millis: String = "event_millis",
      amount: String = "amount",
      location: String = "location",
      tieBreak: String = "event_id",
      rapidCount: Int = RapidTxCountV1
  ): DataFrame = {
    val byKey = Window.partitionBy(col(key))
    val rangeW = byKey.orderBy(col(millis)).rangeBetween(-RapidWindowMs, 0)
    val lagW = byKey.orderBy(col(millis), col(tieBreak))

    val prevLoc = lag(col(location), 1).over(lagW)
    val prevMs = lag(col(millis), 1).over(lagW)

    val dist = haversineKm(latFor(prevLoc), lonFor(prevLoc), latFor(col(location)), lonFor(col(location)))

    val highHit = col(amount) > MaxAmount
    val rapidHit = count(lit(1)).over(rangeW) >= rapidCount
    val travelHit = prevLoc.isNotNull && prevMs.isNotNull &&
      col(location) =!= prevLoc &&
      (col(millis) - prevMs) <= ImpossibleTravelMs &&
      latFor(col(location)).isNotNull && latFor(prevLoc).isNotNull &&
      dist > TravelDistanceKm

    val score =
      when(highHit, HighAmountScore).otherwise(0) +
        when(rapidHit, RapidScore).otherwise(0) +
        when(travelHit, TravelScore).otherwise(0)

    df.withColumn("rule_high_amount", highHit)
      .withColumn("rule_rapid", rapidHit)
      .withColumn("rule_travel", coalesce(travelHit, lit(false)))
      .withColumn("score", score.cast("int"))
      .withColumn("status", when(score >= FraudThreshold, "FRAUD").otherwise("LEGIT"))
      .withColumn("severity", when(score >= HighSeverityThreshold, "HIGH").otherwise("NONE"))
      .withColumn(
        "reasons",
        concat_ws(
          ",",
          when(highHit, ReasonHighAmount),
          when(rapidHit, ReasonRapid),
          when(coalesce(travelHit, lit(false)), ReasonTravel)
        )
      )
  }

  /** Score a transaction frame in the reference's wire schema: parse the
    * `Z`-suffixed ISO timestamp to epoch millis exactly as
    * fraud_detection.py:85 does (strip Z, parse, session TZ pinned UTC).
    */
  def scoreTransactions(tx: DataFrame, rapidCount: Int = RapidTxCountV1): DataFrame = {
    val withMs = tx.withColumn(
      "event_millis",
      unix_millis(to_timestamp(regexp_replace(col("timestamp"), "Z$", "")))
    )
    withScores(withMs, rapidCount = rapidCount)
  }
}
