package graft.streaming

import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.{DataFrame, Dataset}

import graft.operators.{BmStore, Retrieval}

/** Online BM25 serving: a stream of query TEXTS answered from the
  * persisted postings store (operators/BmStore) — the lexical twin of
  * [[AnnServe]], completing the retrieval family's serving symmetry:
  *
  *   - documents arrive, queries stand  → [[Percolate]] (prospective)
  *   - queries arrive, corpus stands    → THIS         (retrospective)
  *
  * Per micro-batch, the (small — these are serving requests) query
  * batch is collected to the driver, its statistics freeze via one
  * O(batch-vocab) df lookup against the store's vocab table
  * (`BmStore.frozenStatsForQueries` — terms outside the index
  * vocabulary score nothing, the standard unknown-term convention), and
  * one bucket-pruned scan of the postings table scores candidate
  * postings only. The corpus text is never read. Arithmetic is
  * identical to `text_bm25_topk`, so a streamed corpus-member query doc
  * returns exactly its batch rows — spec-asserted (BmServeSpec), the
  * stream ≡ batch discipline every graft streaming operator follows.
  *
  * Results flow through foreachBatch so any sink works; batch_id makes
  * a retried micro-batch idempotent for overwrite-by-batch sinks (the
  * streaming.Ingest pattern).
  */
object BmServe {

  /** One serving request: caller-assigned id + the query text. A
    * corpus-member id also activates the self-exclusion the batch
    * scorer applies (a query doc never retrieves itself).
    */
  final case class BmQuery(query_id: Long, text: String)

  /** Start serving `queries` against the postings store at `root`; each
    * answered micro-batch (query_id, rank, doc_id, n_terms, score) is
    * handed to `sink` with its batch id.
    */
  def serve(queries: Dataset[BmQuery], root: String,
      sink: (DataFrame, Long) => Unit,
      k: Int = Retrieval.BmTopK,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    queries.writeStream
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[BmQuery], batchId: Long) =>
        val qs = batch.collect()
          .map(q => (q.query_id, q.text.split(" ", -1).toSeq)).toSeq
        if (qs.nonEmpty) {
          val s = batch.sparkSession
          val frozen = BmStore.frozenStatsForQueries(s, root, qs)
          sink(BmStore.serveDisplay(s, root, frozen, k), batchId)
        }
      }
      .start()
}
