package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.sources.Tables

/** The Gopher/MassiveText quality-filter rule bundle (Rae et al. 2021,
  * arXiv:2112.11446 §A1.1 — the heuristics reused by RedPajama, Dolma
  * and FineWeb): per-document structural statistics and the rule
  * verdicts they imply —
  *
  *   - word count in [50, 100 000]
  *   - mean word length in [3, 10] characters
  *   - symbol-to-word ratio ('#' or '...') ≤ 0.1
  *   - ≥ 80 % of words contain at least one alphabetic character
  *   - ≥ 2 distinct stop words present (the, be, to, of, and, that,
  *     have, with)
  *   - ≤ 90 % of lines start with a bullet
  *   - ≤ 30 % of lines end with an ellipsis
  *
  * `pass` is the conjunction — the binary keep/drop decision the
  * published pipelines apply before any model-based scoring.
  *
  * The fixture corpus is single-line word salad, so (pii-scrub idiom)
  * the query first plants deterministic doc_id-derived mutations —
  * symbol runs, numeric words, stop words, bullet lines, ellipsis
  * lines — giving every rule known per-doc ground truth while staying
  * honestly exercised.
  *
  * == Determinism ==
  *
  * Every emitted statistic is an exact integer, and every threshold is
  * evaluated in INTEGER space (`10·symbols ≤ words`, `3·W ≤ C ≤ 10·W`,
  * `5·alpha ≥ 4·W`, …) — no ratio division anywhere, so there is no
  * half-exact rounding seam between engines at all.
  *
  * == 100 TB shape ==
  *
  * Pure per-row projection: one scan, scalar string work, zero
  * shuffles, zero joins. The three higher-order filters (alpha words,
  * bullet/ellipsis lines, stop-word membership) are interpreted eval,
  * so the scan rides [[Materialize.spreadScan]] like the other
  * HOF-heavy text operators.
  */
object QualityRules {

  val StopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  private val stopArr = array(StopWords.map(lit): _*)
  private val stopSql = StopWords.map(w => s"'$w'").mkString("[", ", ", "]")

  /** doc_id-derived planted mutations (Spark side). */
  private def planted: Column = concat(
    col("text"),
    // 8 hash-runs → trips the symbol rule on doc_id % 7 == 0
    expr("repeat(' ##', if(doc_id % 7 = 0, 8, 0))"),
    // 20 numeric words → trips the alpha-word rule on doc_id % 11 == 0
    expr("repeat(' 123456', if(doc_id % 11 = 0, 20, 0))"),
    // 200 one-char words drag mean word length under 3 on doc_id % 17 == 0
    expr("repeat(' a', if(doc_id % 17 = 0, 200, 0))"),
    // stop words on doc_id % 3 != 0 → the % 3 == 0 docs FAIL ok_stopwords
    expr("if(doc_id % 3 = 0, '', ' the and of to')"),
    // 12 bullet lines → 12 of 13 lines bulleted, trips the bullet rule
    expr("repeat(concat('\\n', '- bullet item'), if(doc_id % 5 = 0, 12, 0))"),
    // 2 of 3 lines end '...' → trips the ellipsis-line rule
    expr("repeat(concat('\\n', 'trailing words...'), if(doc_id % 13 = 0, 2, 0))"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_gopher_rules" -> ((s, d) =>
      Materialize.spreadScan(Tables.documents(s, d))
        .withColumn("t", planted)
        .withColumn("ws", split(col("t"), "\\s+"))
        .withColumn("lines", split(col("t"), "\n"))
        .select(
          col("doc_id"),
          size(col("ws")).cast("long").as("n_words"),
          length(regexp_replace(col("t"), "\\s", "")).cast("long").as("n_word_chars"),
          ((length(col("t")) - length(regexp_replace(col("t"), "#", ""))) +
            expr("(length(t) - length(replace(t, '...', ''))) div 3"))
            .cast("long").as("n_symbols"),
          expr("size(filter(ws, w -> w rlike '[A-Za-z]'))").cast("long").as("n_alpha_words"),
          size(filter(stopArr, sw => array_contains(col("ws"), sw)))
            .cast("long").as("n_stop_hits"),
          size(col("lines")).cast("long").as("n_lines"),
          expr("size(filter(lines, l -> l like '- %' or l like '* %'))")
            .cast("long").as("n_bullet_lines"),
          expr("size(filter(lines, l -> l like '%...'))")
            .cast("long").as("n_ellipsis_lines"))
        .withColumn("ok_word_count",
          col("n_words") >= 50 && col("n_words") <= 100000)
        .withColumn("ok_mean_word_len",
          lit(3) * col("n_words") <= col("n_word_chars") &&
            col("n_word_chars") <= lit(10) * col("n_words"))
        .withColumn("ok_symbol_ratio", lit(10) * col("n_symbols") <= col("n_words"))
        .withColumn("ok_alpha_words",
          lit(5) * col("n_alpha_words") >= lit(4) * col("n_words"))
        .withColumn("ok_stopwords", col("n_stop_hits") >= 2)
        .withColumn("ok_bullet_lines",
          lit(10) * col("n_bullet_lines") <= lit(9) * col("n_lines"))
        .withColumn("ok_ellipsis_lines",
          lit(10) * col("n_ellipsis_lines") <= lit(3) * col("n_lines"))
        .withColumn("pass",
          col("ok_word_count") && col("ok_mean_word_len") &&
            col("ok_symbol_ratio") && col("ok_alpha_words") &&
            col("ok_stopwords") && col("ok_bullet_lines") &&
            col("ok_ellipsis_lines")))
  )

  def oracleSql: Map[String, String] = Map(
    "text_gopher_rules" ->
      s"""WITH p AS (SELECT doc_id,
         |    text
         |    || repeat(' ##', CASE WHEN doc_id % 7 = 0 THEN 8 ELSE 0 END)
         |    || repeat(' 123456', CASE WHEN doc_id % 11 = 0 THEN 20 ELSE 0 END)
         |    || repeat(' a', CASE WHEN doc_id % 17 = 0 THEN 200 ELSE 0 END)
         |    || CASE WHEN doc_id % 3 = 0 THEN '' ELSE ' the and of to' END
         |    || repeat(chr(10) || '- bullet item', CASE WHEN doc_id % 5 = 0 THEN 12 ELSE 0 END)
         |    || repeat(chr(10) || 'trailing words...', CASE WHEN doc_id % 13 = 0 THEN 2 ELSE 0 END)
         |    AS t
         |  FROM documents),
         |c AS (SELECT doc_id, t,
         |    regexp_split_to_array(t, '\\s+') ws,
         |    string_split(t, chr(10)) lines
         |  FROM p),
         |n AS (SELECT doc_id,
         |    len(ws)::BIGINT n_words,
         |    length(regexp_replace(t, '\\s', '', 'g'))::BIGINT n_word_chars,
         |    ((length(t) - length(replace(t, '#', '')))
         |      + (length(t) - length(replace(t, '...', ''))) // 3)::BIGINT n_symbols,
         |    len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]')))::BIGINT n_alpha_words,
         |    len(list_filter($stopSql, sw -> list_contains(ws, sw)))::BIGINT n_stop_hits,
         |    len(lines)::BIGINT n_lines,
         |    len(list_filter(lines, l -> l LIKE '- %' OR l LIKE '* %'))::BIGINT n_bullet_lines,
         |    len(list_filter(lines, l -> l LIKE '%...'))::BIGINT n_ellipsis_lines
         |  FROM c)
         |SELECT *,
         |  (ok_word_count AND ok_mean_word_len AND ok_symbol_ratio AND ok_alpha_words
         |   AND ok_stopwords AND ok_bullet_lines AND ok_ellipsis_lines) pass
         |FROM (SELECT *,
         |    (n_words >= 50 AND n_words <= 100000) ok_word_count,
         |    (3 * n_words <= n_word_chars AND n_word_chars <= 10 * n_words) ok_mean_word_len,
         |    (10 * n_symbols <= n_words) ok_symbol_ratio,
         |    (5 * n_alpha_words >= 4 * n_words) ok_alpha_words,
         |    (n_stop_hits >= 2) ok_stopwords,
         |    (10 * n_bullet_lines <= 9 * n_lines) ok_bullet_lines,
         |    (10 * n_ellipsis_lines <= 3 * n_lines) ok_ellipsis_lines
         |  FROM n)""".stripMargin
  )
}
