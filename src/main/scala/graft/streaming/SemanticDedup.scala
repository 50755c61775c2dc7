package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}

/** Streaming semantic (embedding-level) dedup — the ingest-time twin of
  * the batch `dedup_semantic` operator, completing the pattern the other
  * LLM-pipeline families already follow ([[StreamDedup]] for simhash,
  * [[SigStream]] for components, [[AnnServe]] for ANN serving): a corpus
  * maintained by a stream must reject semantic near-dups as vectors
  * ARRIVE, not in a nightly batch pass.
  *
  * Same SemDeDup shape, incremental: cluster assignment against FROZEN
  * trained centroids (the batch Lloyd model via
  * [[graft.operators.Similarity.frozenCentroids]] — assignment reuses the
  * identical registered IvfTopCells expression, so stream and batch
  * assign bit-identically), then per-cluster keyed state holding recent
  * (vec_id, embedding, norm, millis) residents: each arrival compares
  * against only its own cluster's residents and emits pairs whose exact
  * cosine clears the `SemanticDupThreshold`. One cluster per vector means
  * each pair surfaces exactly once — no cross-band dedup step needed
  * (unlike the 7-band simhash stream).
  *
  * Scale shape: the cluster key partitions state K ways, so per-key
  * resident volume is (arrivals within horizon)/K — and K is derived from
  * corpus size in the batch trainer (k ≈ n / target-cluster-size), so
  * per-key state is ~target-cluster-size × horizon-fraction regardless of
  * corpus scale. Residents are pruned to `withinMs` of the newest arrival
  * on every update (an older vector can no longer form a reportable
  * pair), and a processing-time TTL with the [[Cep.TtlMarginFactor]] lag
  * margin reclaims clusters that stop receiving traffic. The norm is
  * computed once per resident at admission — the same
  * 1-dot-plus-1-multiply-per-pair discipline as the batch join.
  *
  * Trigger note (measured, StreamBench): the ProcessingTimeTimeout makes
  * `Trigger.AvailableNow` schedule timeout-evaluation batches
  * indefinitely after the data drains (6000+ empty commits before the
  * run was killed) — the TTL is for CONTINUOUS deployments
  * (ProcessingTime triggers); bounded replays and tests should drain
  * with `Trigger.Once`. [[StreamDedup]] shares this property.
  */
object SemanticDedup {

  /** One arriving vector (embedding already widened to double — the same
    * float→double cast surface the batch reader applies).
    */
  final case class VecArrival(vec_id: Long, embedding: Seq[Double], event_millis: Long)

  final case class DupPair(cluster_id: Int, id1: Long, id2: Long,
      cosine: Double, event_millis: Long)

  /** Cluster residents as (vec_id, embedding, norm, millis) tuples —
    * publicly-constructible for the state encoder.
    */
  final case class ClusterState(residents: List[(Long, Seq[Double], Double, Long)])

  /** Exactly the batch rounding: Spark's `round` is BigDecimal HALF_UP,
    * so a stream cosine (sequential left-to-right dot — the same fold as
    * the codegen'd dot_double — over norms multiplied) rounds
    * bit-identically to the batch one.
    */
  private[streaming] def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def norm(a: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * a(i); i += 1 }
    math.sqrt(s)
  }

  /** vecs → (cluster_id, vec_id, embedding, event_millis) via the frozen
    * centroids' registered assignment expression — a pure streaming
    * projection, no state.
    */
  def assign(vecs: Dataset[VecArrival],
      centroids: Array[Array[Double]]): Dataset[(Int, Long, Seq[Double], Long)] = {
    val spark = vecs.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val fn = graft.functions.GraftFunctions.registerIvf(spark, centroids, 1)
    import spark.implicits._
    vecs.toDF()
      .select(expr(s"element_at($fn(embedding), 1)").as("cluster_id"),
        col("vec_id"), col("embedding"), col("event_millis"))
      .as[(Int, Long, Seq[Double], Long)]
  }

  /** Per-cluster comparisons over the keyed assigned stream: every
    * arrival scores against the horizon-pruned residents of its cluster,
    * emitting pairs at cosine ≥ `threshold` (id1 < id2, the batch
    * convention).
    */
  def clusterPairs(
      assigned: Dataset[(Int, Long, Seq[Double], Long)],
      withinMs: Long,
      threshold: Double
  ): Dataset[DupPair] = {
    implicit val pairEnc: Encoder[DupPair] = Encoders.product[DupPair]
    implicit val stateEnc: Encoder[ClusterState] = Encoders.product[ClusterState]
    implicit val intEnc: Encoder[Int] = Encoders.scalaInt
    assigned
      .groupByKey(_._1)
      .flatMapGroupsWithState[ClusterState, DupPair](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (clusterId, rows, state: GroupState[ClusterState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var residents = state.getOption.map(_.residents).getOrElse(Nil)
            val out = scala.collection.mutable.ListBuffer.empty[DupPair]
            rows.toSeq
              .sortBy { case (_, id, _, ms) => (ms, id) }
              .foreach { case (_, id, embSeq, ms) =>
                val emb = embSeq.toArray
                val n = norm(emb)
                residents = residents.filter { case (_, _, _, rms) => ms - rms <= withinMs }
                residents.foreach { case (rid, remb, rn, _) =>
                  if (rid != id) {
                    // raw-cosine prefilter before the (exact but boxed)
                    // HALF_UP rounding: a raw value more than 1e-3 below
                    // the threshold cannot round up past it (rounding
                    // moves a value by < 5e-5), so the BigDecimal only
                    // runs for near-threshold candidates
                    val b = remb.toArray
                    var dot = 0.0
                    var i = 0
                    while (i < emb.length) { dot += emb(i) * b(i); i += 1 }
                    if (dot / (n * rn) >= threshold - 1e-3) {
                      val c = round4(dot / (n * rn))
                      if (c >= threshold)
                        out += DupPair(clusterId, math.min(rid, id), math.max(rid, id), c, ms)
                    }
                  }
                }
                residents = (id, embSeq, n, ms) :: residents
              }
            if (residents.isEmpty) { if (state.exists) state.remove() }
            else {
              state.update(ClusterState(residents))
              state.setTimeoutDuration(math.max(Cep.TtlMarginFactor * withinMs, 1000L))
            }
            out.iterator
          }
      }
  }

  /** Full streaming operator: arrivals → frozen-centroid assignment →
    * per-cluster state → confirmed semantic dup pairs.
    *
    * @param centroids the frozen batch-trained model; train offline with
    *                  the batch operator (`Similarity.frozenCentroids`)
    */
  def dupPairs(
      vecs: Dataset[VecArrival],
      centroids: Array[Array[Double]],
      withinMs: Long = 3600000L,
      threshold: Double = graft.operators.Similarity.SemanticDupThreshold
  ): DataFrame = {
    clusterPairs(assign(vecs, centroids), withinMs, threshold)
      .select("cluster_id", "id1", "id2", "cosine")
  }

  /** Convenience for parity tests and ad-hoc runs: the frozen model for a
    * dataset dir (delegates to the shared batch trainer cache).
    */
  def centroidsFor(spark: SparkSession, d: String): Array[Array[Double]] =
    graft.operators.Similarity.frozenCentroids(spark, d)
}
