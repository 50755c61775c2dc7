package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.{DataFrame, SaveMode}

import graft.operators.TextOps
import graft.sources.Writers

/** Streaming training-data ingest — the streaming twin of
  * [[graft.operators.TrainingPipeline]]'s batch funnel: a document stream
  * is quality-gated (shared [[TextOps.withQuality]] expression), exactly
  * deduplicated on the text hash within a watermark, and appended as
  * lang-partitioned parquet shards per micro-batch.
  *
  * Scale shape: the quality gate is scalar column work on the stream; the
  * dedup state is keyed by md5(text) and bounded by the watermark (state
  * for a hash is dropped once the watermark passes its event time — the
  * streaming analogue of the batch job's corpus-wide exact dedup, with the
  * usual streaming trade-off that only duplicates arriving within the
  * watermark horizon are suppressed); the shard write re-uses
  * [[Writers.writeShards]] so each micro-batch appends a bounded number of
  * files per partition directory instead of one sliver per task.
  *
  * Delivery: EXACTLY-ONCE for the shard set. Each micro-batch commits
  * under its own `batch_id=<id>` hive partition via dynamic partition
  * OVERWRITE, so a retry after a partial write replaces exactly the
  * partitions of that batch instead of appending duplicates (micro-batch
  * replay from the checkpoint is deterministic, so the retry carries the
  * same rows). Readers scan the root and still prune on `lang`
  * (top-level partition); `batch_id` doubles as commit lineage.
  *
  * Caveat — exactly-once is up to intra-batch duplicate CHOICE:
  * `dropDuplicatesWithinWatermark` keeps the first-SEEN row per
  * `text_hash` within a batch, and "first seen" depends on partition
  * evaluation order. If the upstream carries true duplicates within one
  * micro-batch AND is nondeterministically partitioned (e.g. a
  * round-robin `repartition` before the sink), a replay can keep a
  * different survivor; if that changes the batch's `lang` set, a stale
  * `lang=<x>/batch_id=<n>` dir from the failed attempt survives the
  * dynamic overwrite. With deterministic upstream partitioning (the
  * normal Kafka-partition → task mapping) the claim is exact.
  */
object Ingest {

  /** Idempotent per-batch shard commit: lang-partitioned like the batch
    * writer, sub-partitioned by batch id, dynamic-overwrite so replaying a
    * batch id is a no-op-equivalent rewrite. Package-visible so the spec
    * can replay a batch directly.
    */
  private[graft] def commitBatch(batch: DataFrame, outDir: String,
      batchId: Long): Unit =
    Writers.writeShards(batch.withColumn("batch_id", lit(batchId)),
      outDir, partitionCols = Seq("lang", "batch_id"),
      sortCols = Seq("doc_id"), mode = SaveMode.Overwrite,
      options = Map("partitionOverwriteMode" -> "dynamic"))

  /** Names of the two in-flight telemetry points ([[ingest]]'s `observe`
    * calls); each micro-batch's counters surface under these keys in
    * `StreamingQueryProgress.observedMetrics`.
    */
  val ObserveIn = "graft_ingest_in"
  val ObserveOut = "graft_ingest_out"

  /** Start the ingest query.
    *
    * Telemetry rides the stream itself via `Dataset.observe` — Spark
    * evaluates the counters as accumulators inside the existing pass over
    * each micro-batch (NO second scan, NO extra shuffle; the aggregates
    * are all commutative partial-merges). `ObserveIn` (pre-gate) records
    * rows/empty-text/null-lang/below-threshold counts — the corpus_validate
    * signals, measured on data that is about to be DROPPED, which a
    * post-hoc batch validate of the written shards could never see.
    * `ObserveOut` (post-dedup) records survivor rows and chars, so
    * gate-rate and dedup-rate per batch are two progress-event reads. At
    * 100 TB this replaces a second validation job over every ingest batch.
    *
    * @param docs       streaming frame with doc_id, text, lang, source and
    *                   an `event_time` timestamp column
    * @param outDir     shard output root (hive-partitioned by lang)
    * @param checkpointDir streaming checkpoint
    * @param minQuality quality_score gate (same 0-1 scale as text_quality)
    * @param watermark  dedup horizon, e.g. "10 minutes"
    */
  def ingest(docs: DataFrame, outDir: String, checkpointDir: String,
      minQuality: Double = 0.5, watermark: String = "10 minutes"): StreamingQuery =
    TextOps.withQuality(docs)
      .observe(ObserveIn,
        count(lit(1)).as("rows_in"),
        count(when(length(trim(col("text"))) === 0, 1)).as("empty_text"),
        count(when(col("lang").isNull || col("lang") === "", 1)).as("null_lang"),
        count(when(col("quality_score") < minQuality, 1)).as("below_quality"))
      .filter(col("quality_score") >= minQuality)
      .withColumn("text_hash", md5(col("text")))
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark("text_hash")
      .select("doc_id", "text", "lang", "source", "quality_score", "text_hash", "event_time")
      .observe(ObserveOut,
        count(lit(1)).as("rows_out"),
        sum(length(col("text"))).as("chars_out"))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // No isEmpty pre-check: that is a second action on the micro-batch
        // plan (the deduped batch would execute twice), and an empty
        // dynamic-overwrite write touches no partitions. Retry safety comes
        // from the batch_id partition, not from downstream dedup — see the
        // object doc.
        commitBatch(batch, outDir, batchId)
      }
      .start()
}
