package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming join surface (north_star extension — the reference has no
  * joins at all, SURVEY.md §2 "operators the reference does NOT have"):
  *
  *  - stream-stream event-time interval join with watermarks on both
  *    sides: state is keyed by the equi-key, and the interval bound plus
  *    both watermarks lets Spark evict matched/old rows, so state size
  *    tracks the interval, not the stream length — the property that
  *    keeps this viable on an unbounded 100 TB/day feed.
  *  - stream-static broadcast enrichment: the static dim is broadcast per
  *    micro-batch, no shuffle on the stream side.
  *  - exact dedup within the watermark horizon
  *    (`dropDuplicatesWithinWatermark`): the streaming twin of the batch
  *    `dedup_exact` operator; state holds one key per event inside the
  *    horizon only.
  *
  * Every method accepts batch frames too (watermarks are applied only when
  * `isStreaming`), which is how the spec pins stream ≡ batch.
  */
object StreamJoins {

  private def wm(df: DataFrame, tsCol: String, delay: String): DataFrame =
    if (df.isStreaming) df.withWatermark(tsCol, delay) else df

  /** Purchases matched to a same-user signup no older than `maxGap`
    * (event-time interval join on the `events` shape:
    * user_id, ts, event_type, value).
    */
  def signupPurchaseInterval(events: DataFrame, maxGap: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame = {
    val signups = wm(
      events.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts").as("s_ts")),
      "s_ts", watermark)
    val purchases = wm(
      events.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"), col("value")),
      "p_ts", watermark)
    purchases.join(signups,
      purchases("user_id") === signups("user_id") &&
        col("p_ts") >= col("s_ts") &&
        col("p_ts") <= col("s_ts") + expr(s"INTERVAL $maxGap"))
      .select(purchases("user_id"), col("s_ts"), col("p_ts"), col("value"))
  }

  /** Left-outer variant of [[signupPurchaseInterval]]: every purchase emits
    * exactly once — matched purchases as in the inner form, unmatched ones
    * with a null signup side once BOTH watermarks pass the interval bound
    * (the stream cannot decide "no signup will ever match" until event time
    * moves past `s_ts + maxGap`; the batch dual emits the same nulls
    * immediately). State eviction is identical to the inner join, so state
    * still tracks the interval, not the stream length.
    */
  def signupPurchaseIntervalOuter(events: DataFrame, maxGap: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame = {
    val signups = wm(
      events.filter(col("event_type") === "signup")
        .select(col("user_id").as("s_user_id"), col("ts").as("s_ts")),
      "s_ts", watermark)
    val purchases = wm(
      events.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"), col("value")),
      "p_ts", watermark)
    purchases.join(signups,
      purchases("user_id") === signups("s_user_id") &&
        col("p_ts") >= col("s_ts") &&
        col("p_ts") <= col("s_ts") + expr(s"INTERVAL $maxGap"),
      "left_outer")
      .select(purchases("user_id"), col("s_ts"), col("p_ts"), col("value"))
  }

  /** Stream-static enrichment: transactions joined to a small static dim
    * (broadcast — zero shuffle on the stream side).
    */
  def enrich(tx: DataFrame, dim: DataFrame, key: String): DataFrame =
    tx.join(broadcast(dim), Seq(key), "left")

  /** Exact streaming dedup on `idCols` within the watermark horizon. */
  def dedupWithinWatermark(events: DataFrame, tsCol: String,
      watermark: String, idCols: Seq[String]): DataFrame = {
    val w = wm(events, tsCol, watermark)
    if (w.isStreaming) w.dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)
    else w.dropDuplicates(idCols)
  }
}
