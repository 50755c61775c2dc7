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
  * the k-th (score, doc_id) pair of the batch sample becomes the cut —
  * a PAIR, not a bare score, because the batch ranking breaks score
  * ties by doc_id and a score-only cut would admit the tied candidate
  * the batch excluded (self-review r11). Every arrival's verdict is
  * immediate, immutable, and exactly-once. An empty batch selection
  * (no candidate pool) freezes to an admit-nothing gate rather than
  * failing. The spec proves the admitted ≡ sample equivalence
  * row-for-row.
  *
  * == Scale shape ==
  *
  * Pure stateless projection: the model rides in as one 256-long
  * literal array plus the cut pair (kilobytes, corpus-independent); the
  * per-arrival cost is one md5 + array lookup per token. No state
  * store, no watermark, no shuffle — throughput scales with input
  * partitions, and a lost executor replays from source offsets.
  * Freezing pays ONE corpus scoring pass (the model itself comes from
  * [[Dsir.modelRows]]'s content-keyed cache, shared with the batch
  * queries).
  *
  * Determinism: the per-token λ lookup and the Gumbel noise use the
  * SAME SQL fragments as the batch operator ([[Dsir.bucketSql]] /
  * [[Dsir.gumbelSql]] — shared constants, not copied strings), so
  * stream scores are bit-identical to `dsir_weights` + the sample's
  * score column over the same snapshot by construction.
  */
object DsirGate {

  /** The frozen selection model: per-bucket quantized log-ratios and
    * the batch sample's k-th (score_q, doc_id) admission cut — None
    * when the batch selection was empty (gate admits nothing).
    */
  final case class FrozenDsir(lam: Seq[Long], cut: Option[(Long, Long)])

  /** Materialize the frozen model from a dataset dir: the model comes
    * from the shared content-keyed cache (one bounded collect); the cut
    * is the K-row sample's last (score_q, doc_id) under the batch order
    * (score desc, doc_id asc) — the index-refresh step a deployment
    * runs per selection cycle.
    */
  def frozen(s: SparkSession, d: String): FrozenDsir = {
    val lam = Dsir.modelRows(s, d).map(_._4).toSeq
    val sample = Dsir.queries("dsir_sample")(s, d)
      .select("score_q", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val cut =
      if (sample.isEmpty) None
      // UNDER-FULL sample (pool < SampleK): the batch selection was not
      // capacity-limited — every scored candidate was admitted — so the
      // gate must admit every scored arrival too. Freezing the k-th-row
      // threshold here would silently tighten the "admit exactly what
      // would have made the batch cut" contract: an arrival scoring
      // below the weakest batch row WOULD have been admitted by a batch
      // re-run with spare capacity (ADVICE r11).
      else if (sample.length < Dsir.SampleK) Some((Long.MinValue, Long.MaxValue))
      // batch order is (score desc, doc_id asc): the weakest admitted
      // row has the min score, and among min-score rows the MAX doc_id
      else {
        val minQ = sample.map(_._1).min
        Some((minQ, sample.filter(_._1 == minQ).map(_._2).max))
      }
    FrozenDsir(lam, cut)
  }

  /** Score a (streaming or batch) frame bearing (doc_id, text) against
    * the frozen model: (doc_id, n_tokens, sum_lam, score_q, accepted).
    */
  def score(docs: DataFrame, frozen: FrozenDsir): DataFrame = {
    require(frozen.lam.size == Dsir.Buckets,
      s"frozen model must cover all ${Dsir.Buckets} buckets")
    // the shared bucket/gumbel fragments now resolve md5_prefix8 (r21) —
    // register against the ARRIVAL frame's session, which need not be the
    // one the model was fitted on
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val accepted = frozen.cut match {
      case None => lit(false)
      case Some((cutQ, cutId)) =>
        // strictly better score, or tied on score and at-or-before the
        // cut doc_id — exactly the batch ranking's admitted region
        col("score_q") > lit(cutQ) ||
          (col("score_q") === lit(cutQ) && col("doc_id") <= lit(cutId))
    }
    docs
      .withColumn("lamv", typedlit(frozen.lam))
      .withColumn("ws", split(col("text"), " "))
      .withColumn("sum_lam", expr(
        s"""aggregate(ws, cast(0 as bigint), (acc, w) -> acc + element_at(lamv,
           |  cast(${Dsir.bucketSql("w")} as int) + 1))""".stripMargin))
      .withColumn("gumbel", expr(Dsir.gumbelSql))
      .withColumn("score_q", col("sum_lam") + col("gumbel"))
      .select(col("doc_id"), size(col("ws")).cast("long").as("n_tokens"),
        col("sum_lam"), col("score_q"), accepted.as("accepted"))
  }
}
