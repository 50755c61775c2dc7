package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.WinnowFps
import graft.sources.Tables

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
  * SIGMOD 2003 — the MOSS algorithm): hash every [[GramLen]]-char gram,
  * slide a [[WinSize]]-window over the hash sequence, and keep each
  * window's MINIMUM as a fingerprint. Winnowing's guarantee is what the
  * content-defined sampling in `dedup_substring` (mod-p selection) does
  * NOT give: at least one fingerprint in every window, so any shared
  * substring of length ≥ GramLen + WinSize − 1 between two documents is
  * certain to surface a shared fingerprint — detection is guaranteed,
  * not probabilistic, while storing only ~2/(WinSize+1) of the gram
  * hashes. The two operators are complementary: mod-p sampling for
  * cheap bulk near-dup discovery, winnowing where missed matches are
  * unacceptable (plagiarism/license/provenance scans over a training
  * corpus).
  *
  * Not a reference operator (the reference is a streaming fraud demo,
  * SURVEY §0) — part of the LLM-pipeline dedup family the build brief
  * grades as first-class.
  *
  * == Determinism / portability ==
  *
  * Gram hash = `int(md5(gram)[:8 hex])` — the module-wide portable hash
  * (Dedup.scala:14). Window minima over EXACT integer hashes are
  * engine-independent, and taking the DISTINCT SET of minima (rather
  * than (position, hash) pairs) sidesteps the rightmost-vs-leftmost
  * tie-break dimension entirely: if two positions in a window tie, both
  * engines keep the same VALUE. All selection happens inside one array
  * expression per document — no explode until fingerprints are final,
  * so the shuffled volume is the winnowed ~2/(w+1) fraction, never the
  * full gram stream.
  *
  * == 100 TB shape ==
  *
  *  - Fingerprinting is scalar column work: one scan, one projection,
  *    per-doc arrays bounded by doc length. Embarrassingly parallel.
  *  - The pair join is an equi-join on fingerprint with a df cap
  *    ([[DfCap]]) exactly like `dedup_ngram_jaccard_capped`: a
  *    boilerplate gram shared by thousands of docs would contribute
  *    df² candidate pairs and zero dedup signal, so high-df
  *    fingerprints are dropped BEFORE the self-join (the cap is on
  *    fingerprints, not documents — no document is excluded).
  *  - Pairs aggregate map-side on (id1, id2) before the
  *    [[MinShared]] filter.
  */
object Winnow {

  /** Gram length k and window size w: matches of length ≥ k + w − 1 = 17
    * chars (~3 consecutive words in the fixture corpus) are guaranteed
    * detected; shorter matches are noise at dedup granularity
    * (Schleimer's t = k + w − 1 "guarantee threshold").
    */
  val GramLen = 12
  val WinSize = 6

  /** Fingerprints appearing in more than DfCap docs are dropped from the
    * pair join (boilerplate, df² blowup); pairs must share at least
    * MinShared surviving fingerprints to be reported.
    */
  val DfCap = 20
  val MinShared = 8

  /** Minimum text length for any fingerprint to exist. */
  val MinLen: Int = GramLen + WinSize - 1

  /** Decontamination-grade parameters: t = 32 + 9 − 1 = 40 chars (~7
    * consecutive words). Benchmark decontamination targets long VERBATIM
    * spans (GPT-3 used 13-token n-grams), not the ~3-word granularity
    * the dedup pair join wants — at GramLen 12 the corpus's common
    * two-word collocations alone make almost every doc share a
    * fingerprint with any eval slice, drowning the signal (measured:
    * 472/475 flagged on the fixture; 40-char spans flag only the real
    * near-dup structure).
    */
  val DecontamGramLen = 32
  val DecontamWinSize = 9
  val DecontamMinLen: Int = DecontamGramLen + DecontamWinSize - 1

  /** Any frame with (doc_id, text) → its winnowed fingerprint arrays
    * (doc_id, fps); docs below [[MinLen]] chars have no window and drop
    * out (both engines agree by construction).
    *
    * Fingerprinting runs as the native [[graft.functions.WinnowFps]]
    * expression — the equivalent pure-SQL transform/slice/array_min form
    * (still the DuckDB oracle) pays interpreted higher-order-function
    * eval per gram and per window, measured ~700× slower (it serialized
    * an entire bench pass behind one task). The scan is spread to the
    * session's parallelism first: the fixture corpus is one small
    * parquet split, and md5-per-gram is exactly the per-row work that
    * must not run on 1 of 32 cores. The guard keeps the shuffle away at
    * real scale, where the input already has ≥ parallelism splits —
    * safe here (unlike the Writers.scala:408 caveat) because `docs` is
    * always a bare scan with no upstream stages to re-execute.
    */
  private[graft] def withFps(docs: DataFrame, gram: Int = GramLen,
      win: Int = WinSize): DataFrame = {
    WinnowFps.register(docs.sparkSession)
    // workFactor 4: md5 per gram (one digest per input CHARACTER) is the
    // heaviest per-byte projection in the engine — r20 width sweep:
    // dedup_winnow_pairs wall 2.4 s at width 4 vs 2.0 at 16, while the
    // blanket full-parallelism spread burned 17 cpu-s in shuffle-file
    // machinery for a 3.0 s wall (see Materialize.spreadScan)
    Materialize.spreadScan(docs, workFactor = 4)
      .filter(length(col("text")) >= gram + win - 1)
      .withColumn("fps", expr(s"winnow_fps(text, $gram, $win)"))
  }

  /** (doc_id, fp) exploded winnowed fingerprints — shared by both
    * queries and the parity specs.
    */
  private[graft] def fingerprints(s: SparkSession, d: String,
      gram: Int = GramLen, win: Int = WinSize): DataFrame =
    fingerprintsOf(Tables.documents(s, d), gram, win)

  /** Frame-accepting twin of [[fingerprints]] (ADVICE r12): a caller
    * fingerprinting a SLICE (DecontamGate's eval side) filters the frame
    * BEFORE the md5-per-gram projection, so build cost is structurally
    * slice-sized — not an optimizer bet on the filter being pushed
    * below the winnow projection and explode.
    */
  private[graft] def fingerprintsOf(docs: DataFrame,
      gram: Int = GramLen, win: Int = WinSize): DataFrame =
    withFps(docs, gram, win)
      .select(col("doc_id"), explode(col("fps")).as("fp"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_winnow_fingerprint" -> ((s, d) =>
      // per-doc fingerprint summary: gram count, window count, selected
      // fingerprint count, and the realized storage density (expected
      // ≈ 2/(w+1) on random text, lower on repetitive text where minima
      // repeat — exactly the repetition signal the density exposes)
      withFps(Tables.documents(s, d))
        .select(col("doc_id"),
          (length(col("text")) - (GramLen - 1)).cast("int").as("n_grams"),
          (length(col("text")) - (MinLen - 1)).cast("int").as("n_windows"),
          size(col("fps")).cast("int").as("n_fps"))
        // density rounds via integer HALF_UP ((2·10⁴·a + b) div 2b), the
        // BM25-score idiom: double round(a/b, 4) diverges between
        // engines on half-exact 4th decimals (e.g. 57/800 = 0.07125 —
        // Spark HALF_UP 0.0713, DuckDB binary-double 0.0712)
        .withColumn("density",
          expr("(20000L * n_fps + n_windows) div (2L * n_windows)") / lit(1e4))),
    "dedup_winnow_pairs" -> ((s, d) => {
      val f = fingerprints(s, d).transform(Materialize.once)
      // df cap BEFORE the self-join: boilerplate fingerprints carry df²
      // pair volume and no signal (same plan shape as the capped
      // jaccard twin). The join then self-joins the SURVIVING postings.
      val rare = f.groupBy("fp").agg(count(lit(1)).as("df"))
        .filter(col("df") <= DfCap)
        .select("fp")
      val fk = f.join(rare, "fp").transform(Materialize.once)
      fk.select(col("fp"), col("doc_id").as("doc_id1"))
        .join(fk.select(col("fp"), col("doc_id").as("doc_id2")), "fp")
        .filter(col("doc_id1") < col("doc_id2"))
        .groupBy("doc_id1", "doc_id2")
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= MinShared)
    }),
    "decontam_winnow" -> ((s, d) => {
      // Winnow-based benchmark decontamination (eval set = the
      // doc_id % 20 == 0 slice, the decontam_* convention): flag train
      // docs sharing ANY fingerprint with the eval set, at the
      // decontamination-grade [[DecontamGramLen]]/[[DecontamWinSize]]
      // parameters. Because winnowing guarantees a shared fingerprint
      // for every common substring of >= DecontamMinLen chars, this
      // catches CHARACTER-level contamination (reflowed punctuation,
      // glued tokens) that the word-shingle decontam_overlap can miss,
      // with a proven no-false-negative bound at 40-char spans. Same
      // plan shape: inverted-index equi-join, never all-pairs; the one
      // fingerprint pass is materialized and feeds both sides.
      val f = fingerprints(s, d, DecontamGramLen, DecontamWinSize)
        .transform(Materialize.once)
      val ev = f.filter(col("doc_id") % 20 === 0).select("fp").distinct()
      val hits = f.filter(col("doc_id") % 20 =!= 0)
        .join(ev, "fp")
        .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
      Tables.documents(s, d).filter(col("doc_id") % 20 =!= 0).select("doc_id")
        .join(hits, Seq("doc_id"), "left")
        .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
        .withColumn("contaminated", col("n_shared") >= 1)
    })
  )

  private def fpCteSqlFor(gram: Int, win: Int): String =
    s"""g AS (SELECT doc_id, list_transform(range(1, length(text) - ${gram - 2}),
       |        i -> ('0x' || substr(md5(substr(text, i::INT, $gram)), 1, 8))::BIGINT) gh
       |      FROM documents WHERE length(text) >= ${gram + win - 1}),
       |m AS (SELECT doc_id, list_distinct(list_transform(range(1, len(gh) - ${win - 2}),
       |        j -> list_aggregate(gh[j::INT:j::INT + ${win - 1}], 'min'))) fps
       |      FROM g),
       |f AS (SELECT doc_id, unnest(fps) fp FROM m)""".stripMargin

  private val fpCteSql: String = fpCteSqlFor(GramLen, WinSize)

  def oracleSql: Map[String, String] = Map(
    // range(a, b) is [a, b): range(1, len-10) ≡ Spark's sequence(1, len-11)
    "text_winnow_fingerprint" ->
      s"""WITH $fpCteSql
         |SELECT m.doc_id,
         |  CAST(length(d.text) - ${GramLen - 1} AS INT) n_grams,
         |  CAST(length(d.text) - ${MinLen - 1} AS INT) n_windows,
         |  CAST(len(m.fps) AS INT) n_fps,
         |  ((20000::BIGINT * len(m.fps) + (length(d.text) - ${MinLen - 1}))
         |    // (2 * (length(d.text) - ${MinLen - 1}))) / 1e4 density
         |FROM m JOIN documents d ON d.doc_id = m.doc_id""".stripMargin,
    "dedup_winnow_pairs" ->
      s"""WITH $fpCteSql,
         |rare AS (SELECT fp FROM f GROUP BY fp HAVING count(*) <= $DfCap),
         |fk AS (SELECT f.doc_id, f.fp FROM f JOIN rare USING (fp))
         |SELECT a.doc_id doc_id1, b.doc_id doc_id2, count(*) n_shared
         |FROM fk a JOIN fk b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= $MinShared""".stripMargin,
    "decontam_winnow" ->
      s"""WITH ${fpCteSqlFor(DecontamGramLen, DecontamWinSize)},
         |ev AS (SELECT DISTINCT fp FROM f WHERE doc_id % 20 = 0),
         |hits AS (SELECT doc_id, count(*)::BIGINT n_shared
         |         FROM f JOIN ev USING (fp) WHERE doc_id % 20 <> 0 GROUP BY 1)
         |SELECT d.doc_id, coalesce(n_shared, 0)::BIGINT n_shared,
         |  coalesce(n_shared, 0) >= 1 contaminated
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 20 <> 0) d
         |LEFT JOIN hits USING (doc_id)""".stripMargin
  )
}
