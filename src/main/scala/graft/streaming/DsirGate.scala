package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Dsir

/** Streaming DSIR admission gate: score every ARRIVING document's hashed
  * n-gram importance weight against a model FROZEN at selection time,
  * and admit exactly the arrivals that would have made the batch
  * Gumbel-top-k cut — the data-selection twin of [[Percolate]]'s frozen
  * BM25 stats and [[AnnServe]]'s frozen centroids, completing the
  * streaming-twin pattern for the selection family (batch
  * `dsir_sample` : THIS :: `text_bm25_topk` : Percolate).
  *
  * == Why a frozen cut ==
  *
  * A true streaming top-k can never emit a final verdict (any future
  * arrival may displace a resident), so production selection gates
  * freeze the model AND the admission threshold at batch-selection time:
  * the k-th score of the batch sample becomes the cut, and every
  * arrival's verdict is immediate, immutable, and exactly-once — an
  * arrival is admitted iff the batch resampler would have ranked it in
  * the top k of its own snapshot. The spec proves that equivalence
  * row-for-row.
  *
  * == Scale shape ==
  *
  * Pure stateless projection: the model rides in as one 256-long
  * literal array plus a scalar cut (kilobytes, corpus-independent); the
  * per-arrival cost is one md5 + array lookup per token. No state
  * store, no watermark, no shuffle — throughput scales with input
  * partitions, and a lost executor replays from source offsets.
  *
  * Determinism: the per-token λ lookup, the 1e-6-quantized Gumbel hash
  * of doc_id, and the integer score sum reproduce the batch ASTs
  * literally, so stream scores are bit-identical to `dsir_weights` +
  * the sample's score column over the same snapshot.
  */
object DsirGate {

  /** The frozen selection model: per-bucket quantized log-ratios and
    * the batch sample's k-th score (the admission cut).
    */
  final case class FrozenDsir(lam: Seq[Long], cutQ: Long)

  /** Materialize the frozen model from a dataset dir: one 256-row
    * collect (the model) + one K-row collect (the cut) — both
    * model-sized, the index-refresh step a deployment runs per batch
    * selection cycle.
    */
  def frozen(s: SparkSession, d: String): FrozenDsir = {
    val lam = Dsir.queries("dsir_logratio")(s, d)
      .select("bucket", "lam").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1).map(_._2).toSeq
    val cut = Dsir.queries("dsir_sample")(s, d)
      .agg(min("score_q")).head().getLong(0)
    FrozenDsir(lam, cut)
  }

  /** Score a (streaming or batch) frame bearing (doc_id, text) against
    * the frozen model: (doc_id, n_tokens, sum_lam, score_q, accepted).
    */
  def score(docs: DataFrame, frozen: FrozenDsir): DataFrame = {
    require(frozen.lam.size == Dsir.Buckets,
      s"frozen model must cover all ${Dsir.Buckets} buckets")
    docs
      .withColumn("lamv", typedlit(frozen.lam))
      .withColumn("ws", split(col("text"), " "))
      .withColumn("sum_lam", expr(
        s"""aggregate(ws, cast(0 as bigint), (acc, w) -> acc + element_at(lamv,
           |  cast(cast(conv(substring(md5(w), 1, 8), 16, 10) as bigint) % ${Dsir.Buckets} as int) + 1))"""
          .stripMargin))
      .withColumn("gumbel", expr(
        "cast(round(-ln(-ln((cast(conv(substring(md5(concat('dsir:', " +
          "cast(doc_id as string))), 1, 8), 16, 10) as bigint) + 0.5) " +
          "/ 4294967296.0)) * 1e6) as bigint)"))
      .withColumn("score_q", col("sum_lam") + col("gumbel"))
      .select(col("doc_id"), size(col("ws")).cast("long").as("n_tokens"),
        col("sum_lam"), col("score_q"),
        (col("score_q") >= lit(frozen.cutQ)).as("accepted"))
  }
}
