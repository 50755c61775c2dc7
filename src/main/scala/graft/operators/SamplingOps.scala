package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Tables

/** Corpus-mixture operators for training-data assembly (north_star): the
  * temperature-scaled language re-weighting used to up-sample rare
  * languages in multilingual pretraining mixes, and the deterministic
  * per-document sampling manifest that realizes those weights.
  *
  * Scale shape: language cardinality is a bounded dimension, so every
  * normalization is a cross join against a broadcast one-row aggregate —
  * no partition-less windows, no driver collect. The per-doc manifest is
  * a broadcast hash join of the corpus scan against the (tiny) rate table
  * plus pure scalar hash arithmetic: one pass, one pipeline, stable under
  * reruns, appends, and repartitioning (the same salted-md5 backbone as
  * split_assign).
  */
object SamplingOps {

  /** Mixture temperature: w_l ∝ p_l^Alpha (α = 0.3 is the standard
    * multilingual up-sampling exponent).
    */
  val Alpha = 0.3

  /** Fraction of the corpus the sampling manifest targets overall. */
  val KeepFraction = 0.5

  /** Bottom-k sample size for the quantile sketch — same k as the KMV
    * distinct sketch; rank-space standard error ≈ sqrt(p(1-p)/k) ≈ 3 %
    * at the median.
    */
  val QuantileK = 256

  /** Quantile positions the sketch publishes. */
  private val QuantilePs = Seq(0.1 -> "p10", 0.5 -> "p50", 0.9 -> "p90", 0.99 -> "p99")

  /** Per-group bottom-k size for the grouped quantile sketch. */
  val GroupQuantileK = 64

  /** (lang, n_docs, n_total, p, weight) with weight rounded at 6 — the
    * rounded value is the published contract, so downstream consumers
    * (sample_manifest, the oracle) agree bit-for-bit. Takes any
    * (lang, n_docs) frame so the counts can come from a corpus scan OR
    * from persisted incremental partials (corpus_mixture_incremental).
    */
  /** [[mixtureFrom]] plus the PRE-ROUND normalized weight (`w_pre`) —
    * kept for [[graft.TieProbe]], which measures how close each
    * plain-`round` column's input lands to a decimal half-way boundary
    * (r20, VERDICT r19 #1). Same plan as before; the probe column is a
    * free intermediate.
    */
  private[graft] def mixtureExtended(byLangRaw: DataFrame): DataFrame = {
    // materialize the (|langs|)-row aggregate once: every downstream
    // branch (total, z, the weight projection) otherwise re-runs the full
    // input pipeline — Spark does not reuse exchanges across self-branches
    val byLang = byLangRaw.transform(Materialize.once)
    val tot = byLang.agg(sum("n_docs").as("n_total"))
    val withP = byLang.crossJoin(broadcast(tot))
      .withColumn("p", col("n_docs") / col("n_total"))
      .withColumn("w_raw", pow(col("p"), Alpha))
    val z = withP.agg(sum("w_raw").as("z"))
    withP.crossJoin(broadcast(z))
      .withColumn("w_pre", col("w_raw") / col("z"))
      .withColumn("weight", round(col("w_pre"), 6))
  }

  private[operators] def mixtureFrom(byLangRaw: DataFrame): DataFrame =
    mixtureExtended(byLangRaw)
      .select("lang", "n_docs", "n_total", "p", "weight")

  private def mixture(s: SparkSession, d: String): DataFrame =
    mixtureFrom(
      Tables.documents(s, d).groupBy("lang").agg(count(lit(1)).as("n_docs")))

  /** The corpus_mixture output projection over a [[mixtureFrom]] frame —
    * shared with the incremental serve so both emit identical columns.
    */
  private[operators] def mixtureOutput(m: DataFrame): DataFrame =
    m.select(
      col("lang"), col("n_docs"),
      ExactRound.round6(col("n_docs"), col("n_total")).as("p"),
      col("weight"),
      round(col("weight") / col("p"), 4).as("upsample"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_approx_quantile_kmv" -> ((s, d) => {
      // Approximate quantiles from a bottom-k-by-hash row sample — the
      // KMV idea (q_approx_distinct_kmv) applied to ORDER STATISTICS.
      // The k rows with the smallest portable md5(row identity) are a
      // uniform, ORDER-INVARIANT, merge-stable sample: the same 256 rows
      // win under any partitioning, append order, or cluster size, so the
      // approximate answer itself is deterministic and hash-checked
      // against DuckDB (unlike percentile_approx's buffer-shape-dependent
      // sketch). Scale shape: the sample is a TakeOrdered (per-partition
      // top-k, O(k) driver merge — never a global sort), and the exact
      // global percentile this replaces would buffer the whole column in
      // one reducer at 100 TB. The quantile is picked with an explicit
      // rank formula (r = max(1, ceil(p·n)), the cumulative-distribution
      // definition) evaluated identically in both engines, dodging
      // builtin percentile_disc tie-semantics drift.
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .withColumn("h", expr(
          "cast(conv(substring(md5(concat(cast(l_orderkey as string), '#', " +
            "cast(l_linenumber as string))), 1, 8), 16, 10) as bigint)"))
      // l_extendedprice closes the sample order (r20): h is md5 of
      // (orderkey, linenumber), which the fixture does NOT keep unique —
      // a dup pair shares h but can differ in extendedprice, and a pair
      // straddling the LIMIT boundary would make the sample (hence the
      // quantile) engine-order-dependent
      val smp = li.orderBy(col("h"), col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"))
        .limit(QuantileK)
      // O(k) rows from here on: the window is over the sample, not data
      val ranked = smp
        .withColumn("r", row_number().over(
          Window.orderBy(col("l_extendedprice"), col("h"))))
        .withColumn("n", count(lit(1)).over(Window.partitionBy()))
      def pick(p: Double) = max(when(
        col("r") === greatest(lit(1L), ceil(lit(p) * col("n"))),
        col("l_extendedprice")))
      val outCols =
        QuantilePs.map { case (p, nm) => round(pick(p), 2).as(s"approx_$nm") } :+
          max(col("n")).as("n_sample")
      ranked.agg(outCols.head, outCols.tail: _*)
    }),
    "text_len_quantiles_by_lang" -> ((s, d) => {
      // The quantile sketch in GROUPED form: per-language document-length
      // p50/p90 from a per-group bottom-k-by-hash sample — the
      // "distribution per slice" question a corpus dashboard asks.
      // Stage 1 ranks within (lang, salt) and keeps k per salt group, so
      // the dominant language never funnels into one reducer (the
      // twoStageTopK argument: the (h, doc_id) order is total and any
      // group-wide bottom-k row is also its salt group's bottom-k, so the
      // two-stage sample is IDENTICAL to the single-stage one the oracle
      // computes). Stage 2 ranks ≤ 32·k rows per lang.
      val k = GroupQuantileK
      val base = Tables.documents(s, d)
        .select(col("lang"), col("doc_id"), col("n_chars"))
        .withColumn("h", expr(
          "cast(conv(substring(md5(concat('qtl:', cast(doc_id as string))), 1, 8), 16, 10) as bigint)"))
        .withColumn("salt", pmod(xxhash64(col("doc_id")), lit(32)))
      val s1 = base.withColumn("r0", row_number().over(
          Window.partitionBy(col("lang"), col("salt")).orderBy(col("h"), col("doc_id"))))
        .filter(col("r0") <= k)
      val smp = s1.withColumn("r1", row_number().over(
          Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))))
        .filter(col("r1") <= k)
      val ranked = smp
        .withColumn("r", row_number().over(
          Window.partitionBy(col("lang")).orderBy(col("n_chars"), col("h"))))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("lang"))))
      def pick(p: Double) = max(when(
        col("r") === greatest(lit(1L), ceil(lit(p) * col("n"))), col("n_chars")))
      ranked.groupBy("lang").agg(
        pick(0.5).as("approx_p50"),
        pick(0.9).as("approx_p90"),
        max(col("n")).as("n_sample"))
    }),
    "corpus_mixture" -> ((s, d) => mixtureOutput(mixture(s, d))),
    "curriculum_manifest" -> ((s, d) => {
      // curriculum sampling: acceptance grows linearly with the document's
      // quality band ("train on cleaner data more often"). The band is a
      // fixed value bucket of the oracle-checked quality score — pure
      // scalar column work, zero shuffle (an ntile/percent_rank decile
      // would force a partition-less global sort), and the accept/reject
      // is the same stable salted-hash backbone as the other manifests.
      TextOps.withQuality(Tables.documents(s, d))
        .withColumn("band", least(lit(9), floor(col("quality_score") * 10)).cast("int"))
        .withColumn("rate", round((col("band") + 1) / lit(10.0), 2))
        .withColumn("bucket", expr(
          "cast(conv(substring(md5(concat('curriculum:', cast(doc_id as string))), 1, 8), 16, 10) as bigint) % 10000"))
        .withColumn("keep", col("bucket") < col("rate") * 10000)
        .select("doc_id", "quality_score", "band", "rate", "bucket", "keep")
    }),
    "corpus_mixture_tokens" -> ((s, d) => {
      // the mixture weighted by TOKEN MASS instead of document counts —
      // what a budgeted pretraining mix actually allocates. The shared
      // normalization core does all the work; only the measure (token
      // sums under the frame's count column) and the output column name
      // differ.
      val byTokens = Tables.documents(s, d)
        .groupBy("lang")
        .agg(sum(size(split(col("text"), " ")).cast("long")).as("n_docs"))
      mixtureOutput(mixtureFrom(byTokens))
        .withColumnRenamed("n_docs", "n_tokens")
    }),
    "sample_manifest_upsampled" -> ((s, d) => {
      // the mixture realized WITH upsampling: rare languages REPEAT
      // (α-temperature multilingual mixes train low-resource docs
      // several times per epoch), common ones thin. n_repeats =
      // floor(rate) + a salted-hash bernoulli on the fractional part,
      // so expected output mass is exactly n_total and the manifest is
      // deterministic under reruns, appends, and repartitions —
      // sample_manifest's accept/reject generalized past rate ≤ 1.
      val rates = mixture(s, d)
        .withColumn("rate",
          round(col("weight") * col("n_total") / col("n_docs"), 6))
        .select("lang", "rate")
      Tables.documents(s, d)
        .join(broadcast(rates), "lang")
        .withColumn("bucket", expr(
          "cast(conv(substring(md5(concat('upsample:', cast(doc_id as string))), 1, 8), 16, 10) as bigint) % 10000"))
        .withColumn("n_repeats",
          (floor(col("rate")) +
            when(col("bucket") < (col("rate") - floor(col("rate"))) * 10000, 1L)
              .otherwise(0L)).cast("long"))
        .select("doc_id", "lang", "bucket", "rate", "n_repeats")
    }),
    "sample_manifest" -> ((s, d) => {
      // per-lang acceptance rate realizing the mixture weights at
      // KeepFraction of the corpus, then a deterministic salted-hash
      // accept/reject per document
      val rates = mixture(s, d)
        .withColumn("rate", round(
          least(lit(1.0), col("weight") * KeepFraction * col("n_total") / col("n_docs")), 6))
        .select("lang", "rate")
      Tables.documents(s, d)
        .join(broadcast(rates), "lang")
        .withColumn("bucket", expr(
          "cast(conv(substring(md5(concat('sample:', cast(doc_id as string))), 1, 8), 16, 10) as bigint) % 10000"))
        .withColumn("keep", col("bucket") < col("rate") * 10000)
        .select("doc_id", "lang", "bucket", "rate", "keep")
    })
  )

  private val mixtureCte =
    s"""bl AS (SELECT lang, count(*) n_docs FROM documents GROUP BY lang),
       |tot AS (SELECT sum(n_docs)::BIGINT n_total FROM bl),
       |wp AS (SELECT lang, n_docs, n_total, n_docs / n_total::DOUBLE p,
       |         pow(n_docs / n_total::DOUBLE, $Alpha) w_raw
       |       FROM bl CROSS JOIN tot),
       |z AS (SELECT sum(w_raw) z FROM wp),
       |mix AS (SELECT lang, n_docs, n_total, p, round(w_raw / z, 6) weight
       |        FROM wp CROSS JOIN z)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_approx_quantile_kmv" -> {
      val picks = QuantilePs.map { case (p, nm) =>
        s"round(max(CASE WHEN r = greatest(1, CAST(ceil($p * n) AS BIGINT)) " +
          s"THEN l_extendedprice END), 2) approx_$nm"
      }.mkString(",\n  ")
      s"""WITH hx AS (SELECT l_extendedprice, l_orderkey, l_linenumber,
         |  ('0x' || substr(md5(l_orderkey::VARCHAR || '#' || l_linenumber::VARCHAR), 1, 8))::BIGINT h
         |  FROM lineitem),
         |smp AS (SELECT l_extendedprice, h FROM hx
         |        ORDER BY h, l_orderkey, l_linenumber, l_extendedprice LIMIT $QuantileK),
         |rk AS (SELECT l_extendedprice, h,
         |         row_number() OVER (ORDER BY l_extendedprice, h) r,
         |         count(*) OVER () n
         |       FROM smp)
         |SELECT
         |  $picks,
         |  max(n)::BIGINT n_sample
         |FROM rk""".stripMargin
    },
    "text_len_quantiles_by_lang" ->
      s"""WITH hx AS (SELECT lang, doc_id, n_chars,
         |  ('0x' || substr(md5('qtl:' || doc_id::VARCHAR), 1, 8))::BIGINT h
         |  FROM documents),
         |rk1 AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) r1 FROM hx),
         |smp AS (SELECT lang, n_chars, h FROM rk1 WHERE r1 <= $GroupQuantileK),
         |rk AS (SELECT lang, n_chars,
         |         row_number() OVER (PARTITION BY lang ORDER BY n_chars, h) r,
         |         count(*) OVER (PARTITION BY lang) n
         |       FROM smp)
         |SELECT lang,
         |  max(CASE WHEN r = greatest(1, CAST(ceil(0.5 * n) AS BIGINT)) THEN n_chars END) approx_p50,
         |  max(CASE WHEN r = greatest(1, CAST(ceil(0.9 * n) AS BIGINT)) THEN n_chars END) approx_p90,
         |  max(n)::BIGINT n_sample
         |FROM rk GROUP BY lang""".stripMargin,
    "curriculum_manifest" ->
      s"""WITH ${TextOps.wsCte}, ${TextOps.qualityCte},
         |m AS (SELECT doc_id, quality_score,
         |        least(9, floor(quality_score * 10))::INT band,
         |        ('0x' || substr(md5('curriculum:' || doc_id::VARCHAR), 1, 8))::BIGINT % 10000 bucket
         |      FROM q),
         |r AS (SELECT *, round((band + 1) / 10.0::DOUBLE, 2) rate FROM m)
         |SELECT doc_id, quality_score, band, rate, bucket,
         |  bucket < rate * 10000 AS keep
         |FROM r""".stripMargin,
    "corpus_mixture" ->
      s"""WITH $mixtureCte
         |SELECT lang, n_docs, ${ExactRound.duck6("n_docs", "n_total")} p, weight,
         |  round(weight / p, 4) upsample
         |FROM mix""".stripMargin,
    "corpus_mixture_tokens" ->
      s"""WITH bl AS (SELECT lang, sum(len(string_split(text, ' ')))::BIGINT n_tokens
         |           FROM documents GROUP BY lang),
         |tot AS (SELECT sum(n_tokens)::BIGINT t_total FROM bl),
         |wp AS (SELECT lang, n_tokens, t_total, n_tokens / t_total::DOUBLE p,
         |         pow(n_tokens / t_total::DOUBLE, $Alpha) w_raw
         |       FROM bl CROSS JOIN tot),
         |z AS (SELECT sum(w_raw) z FROM wp)
         |SELECT lang, n_tokens, ${ExactRound.duck6("n_tokens", "t_total")} p, round(w_raw / z, 6) weight,
         |  round(round(w_raw / z, 6) / p, 4) upsample
         |FROM wp CROSS JOIN z""".stripMargin,
    "sample_manifest_upsampled" ->
      s"""WITH $mixtureCte,
         |r AS (SELECT lang, round(weight * n_total / n_docs, 6) rate FROM mix),
         |b AS (SELECT doc_id, lang,
         |        ('0x' || substr(md5('upsample:' || doc_id::VARCHAR), 1, 8))::BIGINT % 10000 bucket
         |      FROM documents)
         |SELECT b.doc_id, b.lang, b.bucket, r.rate,
         |  (floor(r.rate) + CASE WHEN b.bucket < (r.rate - floor(r.rate)) * 10000
         |                        THEN 1 ELSE 0 END)::BIGINT n_repeats
         |FROM b JOIN r USING (lang)""".stripMargin,
    "sample_manifest" ->
      s"""WITH $mixtureCte,
         |r AS (SELECT lang, round(least(1.0, weight * $KeepFraction * n_total / n_docs), 6) rate
         |      FROM mix),
         |b AS (SELECT doc_id, lang,
         |        ('0x' || substr(md5('sample:' || doc_id::VARCHAR), 1, 8))::BIGINT % 10000 bucket
         |      FROM documents)
         |SELECT b.doc_id, b.lang, b.bucket, r.rate, b.bucket < r.rate * 10000 AS keep
         |FROM b JOIN r USING (lang)""".stripMargin
  )
}
