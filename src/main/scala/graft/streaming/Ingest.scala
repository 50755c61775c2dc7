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
  */
object Ingest {

  /** Start the ingest query.
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
      .filter(col("quality_score") >= minQuality)
      .withColumn("text_hash", md5(col("text")))
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark("text_hash")
      .select("doc_id", "text", "lang", "source", "quality_score", "text_hash", "event_time")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // No isEmpty pre-check: that is a second action on the micro-batch
        // plan (the deduped batch would execute twice), and an empty Append
        // write is harmless. Delivery is AT-LEAST-ONCE: a micro-batch retry
        // after a partial Append leaves duplicate rows in the shards —
        // downstream consumers dedup on text_hash (which this stream
        // carries precisely so replays are reconcilable).
        Writers.writeShards(batch, outDir, partitionCols = Seq("lang"),
          sortCols = Seq("doc_id"), mode = SaveMode.Append)
      }
      .start()
}
