package graft.streaming

import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.{DataFrame, Dataset}

import graft.operators.AnnIndexIO

/** Online ANN serving: a stream of query vectors answered from the
  * persisted IVF×PQ index (operators/AnnIndexIO) — the serving tier of
  * the 100 TB picture. Batch builds and maintains the index; this stream
  * path answers lookups against it without ever scanning the corpus.
  *
  * Per micro-batch, the (small — these are serving requests) query batch
  * is collected to the driver, cell probing and ADC LUTs are computed as
  * pure driver arithmetic over the O(model) artifacts, and one
  * partition-pruned scan of the code table scores only the probed cells
  * (AnnIndexIO.serveVectors). The arithmetic is identical to
  * `ann_ivfpq_topk`, so a streamed answer EQUALS the batch answer for the
  * same query vector — spec-asserted, the stream≡batch discipline every
  * graft streaming operator follows.
  *
  * Results flow through foreachBatch so any sink works; batch_id makes a
  * retried micro-batch idempotent for overwrite-by-batch sinks (the
  * streaming.Ingest pattern).
  */
object AnnServe {

  /** One serving request: caller-assigned id + the query embedding. */
  final case class AnnQuery(query_id: Long, emb: Array[Double])

  /** One new corpus vector for stream-maintained index growth. */
  final case class AnnInsert(vec_id: Long, emb: Array[Double])

  /** Maintain the index FROM a stream: each micro-batch of new vectors is
    * encoded with the frozen model and committed under its own
    * `batch_id=<n>` dirs inside the cell partitions (dynamic partition
    * overwrite — a replayed micro-batch rewrites exactly its own dirs, the
    * streaming.Ingest exactly-once idiom). Index growth costs O(|batch|)
    * per trigger; concurrent serving reads whole published batch dirs.
    * The stream-maintained index is provably identical to the batch
    * incremental build over the same vectors (spec-asserted).
    */
  def maintain(inserts: Dataset[AnnInsert], root: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    inserts.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[AnnInsert], batchId: Long) =>
        AnnIndexIO.appendBatch(batch.sparkSession, root, batch.toDF(), batchId)
      }
      .start()

  /** Start serving `queries` against the index at `root`; each answered
    * micro-batch (query_id, rank, vec_id, approx_dist) is handed to
    * `sink` with its batch id.
    */
  def serve(queries: Dataset[AnnQuery], root: String,
      sink: (DataFrame, Long) => Unit,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    queries.writeStream
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[AnnQuery], batchId: Long) =>
        val qs = batch.collect().map(q => q.query_id -> q.emb).toSeq
        if (qs.nonEmpty)
          sink(AnnIndexIO.serveVectors(batch.sparkSession, root, qs), batchId)
      }
      .start()
}
