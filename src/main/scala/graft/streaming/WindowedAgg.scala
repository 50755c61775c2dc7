package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed aggregations for streams — the Structured
  * Streaming surface (watermark + window) the batch `q_tumbling_hour` /
  * `q_sessionize` queries mirror. Works identically on a batch frame
  * (window() is the same expression), which is how the spec pins
  * stream ≡ batch.
  */
object WindowedAgg {

  /** Tumbling event-time window counts/sums per event_type.
    * @param events frame (streaming or batch) with ts: timestamp, value: double
    */
  def tumbling(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    withWm
      .groupBy(window(col("ts"), windowLen).as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(col("win.start").as("win_start"), col("win.end").as("win_end"),
        col("event_type"), col("n"), col("sum_value"))
  }

  /** Sliding window variant (overlapping windows). */
  def sliding(events: DataFrame, windowLen: String = "1 hour",
      slide: String = "15 minutes", watermark: String = "10 minutes"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    withWm
      .groupBy(window(col("ts"), windowLen, slide).as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("win.start").as("win_start"), col("event_type"), col("n"))
  }

  /** Tumbling-window approximate distinct users via the custom
    * [[graft.functions.KmvDistinct]] aggregate — proves the
    * TypedImperativeAggregate's serialized buffer round-trips through the
    * streaming state store (each micro-batch merges its partials into the
    * window's stored sketch), and because KMV is merge-order-invariant
    * the streamed result is IDENTICAL to the batch aggregation, not just
    * close. Exact streaming distinct would need the full value set in
    * state; the sketch caps window state at k longs.
    */
  def tumblingDistinct(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame = {
    graft.functions.GraftFunctions.register(events.sparkSession)
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    withWm
      .groupBy(window(col("ts"), windowLen).as("win"))
      .agg(expr("kmv_distinct(cast(user_id as string))").as("approx_users"),
        count(lit(1)).as("n"))
      .select(col("win.start").as("win_start"), col("approx_users"), col("n"))
  }

  /** Native session window (gap-based), the streaming dual of the batch
    * lag/cum-sum `q_sessionize`.
    */
  def sessions(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "10 minutes"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    withWm
      .groupBy(session_window(col("ts"), gap).as("win"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .select(col("user_id"), col("win.start").as("sess_start"),
        col("win.end").as("sess_end"), col("n_events"), col("sum_value"))
  }
}
