package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities — the hand-rolled complements of AQE's
  * skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) for the shapes AQE does not cover.
  *
  * At 100 TB a handful of heavy-hitter keys (one merchant, one language,
  * the empty document) can pin a whole stage on one task. AQE splits
  * skewed SortMergeJoin partitions at runtime, but (a) broadcast-ineligible
  * shuffle joins where the skew is on the REPLICABLE side's key
  * distribution, and (b) distinct-aggregations, still need explicit
  * treatment.
  */
object Skew {

  /** Salted shuffle join: spread each left key over `nSalts` sub-keys and
    * replicate the right side once per salt, so one hot key occupies
    * `nSalts` tasks instead of one. Semantics identical to
    * `left.join(right, keys)` (inner). The salt is `monotonically
    * _increasing_id % nSalts` — purely a distribution device; any
    * per-row-distinct value works, no RNG state needed.
    *
    * Use when the right side is too big to broadcast but small enough to
    * replicate `nSalts`×; otherwise prefer AQE skew-join.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      nSalts: Int): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(nSalts.toLong)))
    val saltedRight = right.withColumn("_salt",
      explode(expr(s"sequence(0L, ${nSalts - 1}L)")))
    saltedLeft.join(saltedRight, keys :+ "_salt").drop("_salt")
  }

  /** Two-stage distinct count per key: stage 1 dedups (key, value) —
    * map-side combined, so a hot key's duplicates collapse before the
    * shuffle — stage 2 counts per key. Equivalent to
    * `groupBy(key).agg(countDistinct(value))`, which otherwise shuffles
    * every (key, value) pair to the key's single reducer.
    */
  def twoStageDistinctCount(df: DataFrame, key: String, value: String): DataFrame =
    df.select(key, value).distinct()
      .groupBy(key).agg(count(lit(1)).as("n_distinct"))
}
