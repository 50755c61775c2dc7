package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.GraftFunctions
import graft.operators.{Dedup, Materialize, Winnow}
import graft.sources.Tables

/** Streaming decontamination gate: test every ARRIVING document against
  * the benchmark eval set with artifacts FROZEN at gate-build time — the
  * decontamination twin of [[DsirGate]]'s frozen admission model,
  * completing the streaming-twin pattern for the decontam family (batch
  * `decontam_overlap`/`decontam_bloom`/`decontam_winnow` : THIS ::
  * `dsir_sample` : DsirGate). A training-data ingest that admits crawl
  * documents continuously must reject benchmark-contaminated arrivals AT
  * THE DOOR — re-running the batch sweep per crawl day rescans the
  * corpus for verdicts that were knowable at arrival time.
  *
  * == Why frozen artifacts ==
  *
  * The eval side is a FIXED benchmark suite, not a growing corpus — the
  * one side of the decontam join that genuinely freezes. Three bounded
  * artifacts are built once per benchmark release ([[frozen]]):
  *
  *   1. the eval shingle-fp Bloom filter (the `decontam_bloom` build
  *      artifact: same 2^21 bits / 100k-item shape),
  *   2. the exact eval shingle set (word-level channel),
  *   3. the eval winnow-fingerprint set at decontamination-grade
  *      char-level parameters (the `decontam_winnow` eval side).
  *
  * All three are benchmark-sized — kilobytes to low megabytes at any
  * corpus scale — so they broadcast as expression-resident state.
  *
  * == Two-tier probe (the 100 TB shape) ==
  *
  * Word-level verdicts run bloom-first: every arrival shingle pays one
  * bit-test against the 256 KB filter (cache-resident on every core);
  * only arrivals with ≥1 bloom hit — true contamination plus the fpp
  * tail — reach the exact frozen-set probe that removes false positives
  * (a [[graft.functions.StandingHits]] native expression: one hash
  * probe per shingle, O(|doc|) per arrival, vocabulary-size
  * independent). Bloom filters have no false negatives, so the tier
  * short-circuit provably cannot change a verdict; the emitted
  * `n_bloom ≥ n_shingle_hits` gap is the observable fpp tail. The
  * char-level channel probes the winnow-fingerprint set directly (long
  * hash-set probes). In this single-process deployment the exact sets
  * are already resident, so the bloom tier saves little — its value is
  * the deployment where eval sets are large enough that the exact
  * confirm lives behind a join: the bloom then keeps the common path
  * (clean arrival, the overwhelming majority) join-free.
  *
  * == Scale shape ==
  *
  * Pure stateless projection — no state store, no watermark, no
  * shuffle; throughput scales with input partitions and a lost executor
  * replays from source offsets. Per-arrival cost: O(|shingles|) md5s +
  * bit-tests, O(|text|) winnow rolling-hash work.
  *
  * Verdict parity (spec-proven, DecontamGateSpec): replaying the
  * train-side corpus through the gate reproduces `decontam_overlap`'s
  * (n_shared, contaminated) rows on the word channel and
  * `decontam_winnow`'s on the char channel, row for row.
  */
object DecontamGate {

  /** The frozen eval-side artifacts. `bloom` is None only when the eval
    * slice has no shingles (no doc with ≥3 words) — the gate then emits
    * all-clean word verdicts, matching the batch sweep over the same
    * snapshot.
    */
  final case class FrozenDecontam(
      bloom: Option[Array[Byte]],
      evalShingles: Seq[String],
      evalWinnowFps: Seq[Long])

  /** Shingle→fp expression shared with `decontam_bloom` (60-bit portable
    * md5 prefix).
    */
  private def fpSql(col: String): String =
    s"cast(conv(substring(md5($col), 1, 15), 16, 10) as bigint)"

  /** Materialize the frozen artifacts from the dataset's eval slice
    * (`doc_id % 20 == 0`, the decontam_* convention) — the once-per-
    * benchmark-release build step. One shingle pass and one winnow pass
    * over the EVAL slice only.
    */
  def frozen(s: SparkSession, d: String): FrozenDecontam = {
    val evalSh = Dedup.withShingles(
        Tables.documents(s, d).filter(col("doc_id") % 20 === 0))
      .select(explode(col("sh")).as("s")).distinct()
      .transform(Materialize.once) // feeds the bloom build AND the collect
    val shingles = evalSh.collect().map(_.getString(0)).sorted.toSeq
    val bloom =
      if (shingles.isEmpty) None
      else Some(GraftFunctions.buildBloom(
        evalSh.withColumn("fp", expr(fpSql("s"))),
        "fp", expectedItems = 100000L, numBits = 1L << 21))
    Materialize.drop(evalSh)
    // filter BEFORE fingerprinting (ADVICE r12): the eval-only build
    // cost is structural, not a bet on Catalyst pushing the predicate
    // below the winnow projection and explode
    val wfps = Winnow.fingerprintsOf(
        Tables.documents(s, d).filter(col("doc_id") % 20 === 0),
        Winnow.DecontamGramLen, Winnow.DecontamWinSize)
      .select("fp").distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    FrozenDecontam(bloom, shingles, wfps)
  }

  /** Gate a (streaming or batch) frame bearing (doc_id, text):
    * (doc_id, n_bloom, n_shingle_hits, shingle_contaminated,
    * n_winnow_hits, winnow_contaminated). Verdicts are immediate and
    * immutable — the eval side is frozen, so no future arrival can
    * change them.
    */
  def score(docs: DataFrame, frozen: FrozenDecontam): DataFrame = {
    val s = docs.sparkSession
    GraftFunctions.register(s)
    graft.functions.WinnowFps.register(s)
    val withSh = docs
      // short texts (<3 words / < winnow span) carry no keys — same rows
      // the batch sweeps give n_shared = 0 via their left joins
      .withColumn("sh", coalesce(expr("word_shingles(text)"),
        expr("array()").cast("array<string>")))
      .withColumn("wfps",
        when(length(col("text")) >= Winnow.DecontamMinLen,
          expr(s"winnow_fps(text, ${Winnow.DecontamGramLen}, ${Winnow.DecontamWinSize})"))
          .otherwise(expr("array()").cast("array<bigint>")))
    val withWord = frozen.bloom match {
      case None =>
        withSh.withColumn("n_bloom", lit(0))
          .withColumn("n_shingle_hits", lit(0))
      case Some(bytes) =>
        val probe = GraftFunctions.registerBloomProbe(s, bytes)
        val exact = GraftFunctions.registerStandingHitsStr(s, frozen.evalShingles)
        withSh
          .withColumn("n_bloom", size(expr(
            s"""filter(sh, x -> $probe(xxhash64(${fpSql("x")})))""")))
          // exact confirm ONLY behind a bloom hit: no false negatives, so
          // the short-circuit cannot change the verdict (spec-asserted)
          .withColumn("n_shingle_hits",
            when(col("n_bloom") === 0, lit(0)).otherwise(expr(s"$exact(sh)")))
    }
    val wHits =
      if (frozen.evalWinnowFps.isEmpty) lit(0)
      else {
        val fn = GraftFunctions.registerStandingHitsLong(s, frozen.evalWinnowFps)
        expr(s"$fn(wfps)")
      }
    // hit counts surface as BIGINT (ADVICE r12): the batch twins emit
    // long n_shared / n_hits, and consumers swapping stream and batch
    // outputs should not hit an INT/BIGINT schema seam
    withWord
      .withColumn("n_winnow_hits", wHits)
      .select(col("doc_id"), col("n_bloom"),
        col("n_shingle_hits").cast("long").as("n_shingle_hits"),
        (col("n_shingle_hits") >= 1).as("shingle_contaminated"),
        col("n_winnow_hits").cast("long").as("n_winnow_hits"),
        (col("n_winnow_hits") >= 1).as("winnow_contaminated"))
  }
}
