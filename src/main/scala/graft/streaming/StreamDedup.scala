package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}

/** Streaming near-duplicate detection — the streaming twin of the batch
  * `dedup_simhash_pairs` operator, for ingest pipelines that must reject
  * near-dups as documents ARRIVE rather than in a nightly batch pass.
  *
  * Same algorithm, incremental shape: 48-bit SimHash per document
  * (the codegen'd [[graft.functions.SimHash48]] expression works
  * unchanged in a streaming projection), 7-band pigeonhole explode
  * (hamming ≤ 6 over 48 bits ⇒ ≥ 1 identical 7-bit band — the EXACT
  * candidate guarantee, no cartesian anywhere), then per-(band, bits)
  * keyed state holding recent (doc_id, simhash) arrivals: each new doc
  * compares against only its bucket's residents and emits confirmed
  * pairs. A pair colliding on several bands surfaces once per band, so
  * the stream ends with watermarked exact dedup on (d1, d2) — the same
  * dropDuplicatesWithinWatermark primitive the ingest pipeline uses.
  *
  * State hygiene at the 100 TB/day shape: bucket residents are pruned to
  * `withinMs` of the newest arrival on every update (a doc older than
  * the dedup horizon can no longer form a reportable pair), and a
  * processing-time TTL with the same [[Cep.TtlMarginFactor]] lag margin
  * reclaims buckets that stop receiving traffic entirely.
  *
  * Trigger note: the ProcessingTimeTimeout makes `Trigger.AvailableNow`
  * schedule timeout-evaluation batches indefinitely once the data
  * drains (measured on the [[SemanticDedup]] twin — 6000+ empty
  * commits); the TTL is for continuous deployments. Bounded replays and
  * tests should drain with `Trigger.Once`.
  */
object StreamDedup {

  /** One arriving document (event_millis = event-time of arrival). */
  final case class DocArrival(doc_id: Long, text: String, event_millis: Long)

  final case class NearDupPair(d1: Long, d2: Long, hamming: Int, event_millis: Long)

  /** Bucket residents as (doc_id, simhash, millis) — tuples, because the
    * state encoder needs publicly-constructible types.
    */
  final case class BucketState(residents: List[(Long, Long, Long)])

  /** Per-bucket comparisons over a keyed band-exploded stream.
    *
    * @param banded   (band_key, doc_id, simhash, event_millis) rows —
    *                 7 per document, from [[bandExplode]]
    * @param withinMs dedup horizon: only pairs whose arrivals are within
    *                 this window are reported
    */
  def bucketPairs(
      banded: Dataset[(String, Long, Long, Long)],
      withinMs: Long
  ): Dataset[NearDupPair] = {
    implicit val pairEnc: Encoder[NearDupPair] = Encoders.product[NearDupPair]
    implicit val stateEnc: Encoder[BucketState] = Encoders.product[BucketState]
    implicit val strEnc: Encoder[String] = Encoders.STRING
    banded
      .groupByKey(_._1)
      .flatMapGroupsWithState[BucketState, NearDupPair](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (_, rows, state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var residents = state.getOption.map(_.residents).getOrElse(Nil)
            val out = scala.collection.mutable.ListBuffer.empty[NearDupPair]
            rows.toSeq
              .sortBy { case (_, id, _, ms) => (ms, id) }
              .foreach { case (_, id, sig, ms) =>
                residents = residents.filter { case (_, _, rms) => ms - rms <= withinMs }
                residents.foreach { case (rid, rsig, _) =>
                  if (rid != id) {
                    val hamming = java.lang.Long.bitCount(rsig ^ sig)
                    if (hamming <= 6)
                      out += NearDupPair(math.min(rid, id), math.max(rid, id), hamming, ms)
                  }
                }
                residents = (id, sig, ms) :: residents
              }
            if (residents.isEmpty) { if (state.exists) state.remove() }
            else {
              state.update(BucketState(residents))
              state.setTimeoutDuration(math.max(Cep.TtlMarginFactor * withinMs, 1000L))
            }
            out.iterator
          }
      }
  }

  /** docs(doc_id, text, event_millis) → 7 (band_key, doc_id, simhash,
    * event_millis) rows per doc. Pure scalar projection + explode.
    */
  def bandExplode(docs: Dataset[DocArrival]): Dataset[(String, Long, Long, Long)] = {
    val spark = docs.sparkSession
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    docs.toDF()
      .withColumn("simhash", expr("simhash48(text)"))
      .select(col("doc_id"), col("simhash"), col("event_millis"),
        posexplode(array((0 until 7).map(b =>
          expr(s"shiftright(simhash, ${b * 7}) & 127")): _*)))
      .select(
        concat(col("pos"), lit(":"), col("col")).as("band_key"),
        col("doc_id"), col("simhash"), col("event_millis"))
      .as[(String, Long, Long, Long)]
  }

  /** Full streaming operator: docs → banding → bucket state → confirmed
    * pairs, deduped across bands within the watermark.
    */
  def nearDupPairs(
      docs: Dataset[DocArrival],
      withinMs: Long = 3600000L,
      watermarkDelay: String = "10 seconds"
  ): DataFrame = {
    bucketPairs(bandExplode(docs), withinMs)
      .withColumn("event_time", timestamp_millis(col("event_millis")))
      .withWatermark("event_time", watermarkDelay)
      .dropDuplicatesWithinWatermark("d1", "d2")
      .select("d1", "d2", "hamming")
  }
}
