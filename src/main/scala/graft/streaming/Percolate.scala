package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.operators.Retrieval.FrozenIndexStats

/** Streaming BM25 percolation: score every ARRIVING document against the
  * standing query set, with corpus statistics (df / avgdl / N) FROZEN at
  * index-build time — the retrieval twin of [[AnnServe]]'s
  * frozen-centroid serving, completing the streaming-twin pattern for
  * the retrieval family (StreamDedup : dedup_simhash :: SigStream :
  * components :: AnnServe : ANN :: SemanticDedup : dedup_semantic ::
  * THIS : text_bm25). This inversion — evaluate queries against each
  * arriving document, instead of documents against each arriving query —
  * is the classic "percolator" shape (Elasticsearch percolate queries,
  * prospective search/pub-sub IR): alerting, routing, and standing
  * more-like-this monitors over a corpus ingest stream.
  *
  * == Why frozen statistics ==
  *
  * True streaming df would make every past score a function of future
  * arrivals (df only grows), so no emitted score could ever be final —
  * the same reason real search engines serve BM25 from periodically
  * rebuilt index stats rather than per-insert ones. Freezing at the
  * batch snapshot makes every emitted row immutable (exactly-once
  * append semantics) and bit-identical to the batch
  * [[graft.operators.Retrieval]] scorer over the same corpus — the
  * parity the spec proves.
  *
  * == Scale shape ==
  *
  * The operator is a pure STATELESS projection: the standing-query
  * stats ride in as one literal array (Q standing queries × their
  * distinct terms, with per-term df — kilobytes, the size of the QUERY
  * set, independent of corpus size), and each arrival's term
  * frequencies come from its own token array via higher-order array
  * functions. No state store, no watermark, no shuffle — arrivals score
  * in place on whatever partition they arrive, so throughput scales
  * linearly with input partitions and a lost executor replays cleanly
  * from the source offsets. Per-arrival cost is O(|tokens| + Σ_q
  * |terms_q|): one frozen-vocab HashMap probe per token
  * ([[graft.functions.StandingTf]]) plus an O(1) lookup per standing
  * term — the document-side evaluation cost every percolator pays,
  * without re-walking the token array per (query, term).
  *
  * Determinism: the scoring expression reproduces the batch AST
  * LITERALLY — same constants, same operand order, df/N/sumDl spliced
  * as long literals (long/long division in Spark SQL is double
  * division, matching the batch column expression) — and per-term
  * contributions quantize to 1e-6 longs before the sum, so stream
  * scores hash-match batch scores exactly.
  */
object Percolate {

  /** Score a (streaming or batch) frame bearing (doc_id, text) against
    * the frozen standing-query stats. Emits one row per (arrival,
    * standing query) sharing ≥ 1 term: (query_id, doc_id, n_terms,
    * sum_q) — the same surface as the batch scorer; self-matches
    * (arrival IS the query doc) are excluded, mirroring the batch
    * `doc_id =!= query_id` filter.
    */
  def score(docs: DataFrame, frozen: FrozenIndexStats): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // an all-OOV standing set freezes to an empty query list (every
    // registered term missing from the index vocabulary): match nothing,
    // rather than failing to register an empty-vocab StandingTf
    if (frozen.queries.isEmpty) return emptyScores(docs)
    // the arrival's term frequencies against the DEDUPLICATED standing
    // vocabulary, computed ONCE per arrival by the frozen-vocab
    // [[graft.functions.StandingTf]] expression (one HashMap probe per
    // token). The previous per-(query, term) `size(filter(ws, ...))`
    // walked the token array Σ_q |terms_q| times per arrival in
    // interpreted eval — measured 3.3k docs/s vs this form's O(1)
    // element_at lookups per standing term. Counts are identical
    // integers, so scores are bit-identical by construction.
    val tfFn = graft.functions.GraftFunctions
      .registerStandingTf(spark, frozen.unionTerms)
    // one literal: array<struct<query_id, terms array<struct<term, idx, df>>>>
    val standing: Column = typedlit(frozen.queries)
    val scored: Column = expr(
      s"""aggregate(
         |  transform(q.terms, t -> named_struct(
         |    'tf', element_at(tfs, t.idx + 1), 'df', t.df)),
         |  named_struct('n', 0, 's', cast(0 as bigint)),
         |  (acc, x) -> named_struct(
         |    'n', acc.n + IF(x.tf > 0, 1, 0),
         |    's', acc.s + IF(x.tf > 0,
         |      cast(round(
         |        ln(1.0D + (${frozen.nDocs}L - x.df + 0.5D) / (x.df + 0.5D)) *
         |        (x.tf * 2.2D /
         |          (x.tf +
         |           1.2D * (0.25D + 0.75D * dl / (${frozen.sumDl}L / ${frozen.nDocs}L)))) *
         |        1e6) as bigint),
         |      cast(0 as bigint))))""".stripMargin)
    docs
      .withColumn("ws", split(col("text"), " "))
      .withColumn("dl", size(col("ws")).cast("long"))
      .withColumn("tfs", expr(s"$tfFn(ws)"))
      .withColumn("q", explode(standing))
      .filter(col("doc_id") =!= col("q.query_id"))
      .withColumn("r", scored)
      .filter(col("r.n") > 0)
      .select(col("q.query_id").as("query_id"), col("doc_id"),
        col("r.n").as("n_terms"), col("r.s").as("sum_q"))
  }

  /** The scorer output shape with zero rows — what an empty frozen
    * standing set matches (both formulations; self-review r12: neither
    * frozen-vocab expression can register on an empty vocabulary).
    */
  private def emptyScores(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), lit(0L).as("query_id"),
        lit(0).as("n_terms"), lit(0L).as("sum_q"))
      .filter(lit(false))
      .select("query_id", "doc_id", "n_terms", "sum_q")

  /** [[score]] via the TERM→QUERIES inverted index
    * ([[graft.functions.PercolateHits]]): identical output rows
    * (spec-proven), per-arrival cost linear in the arrival's MATCHED
    * (term, query) pairs instead of Σ_q |terms_q| — the shape that holds
    * at prospective-search scale (thousands of standing queries, where
    * explode-every-query pays mostly-zero work per arrival). Still a
    * stateless projection: the index rides in the expression instance,
    * no shuffle, no state store.
    */
  def scoreIndexed(docs: DataFrame, frozen: FrozenIndexStats): DataFrame = {
    val spark = docs.sparkSession
    // an all-OOV standing set matches nothing — same guard as score()
    if (frozen.queries.isEmpty) return emptyScores(docs)
    // invert (query → terms) to the shared TERM→QUERIES index layout
    val (terms, termDf, termQueries) =
      graft.operators.Retrieval.invertedIndex(frozen)
    val fn = graft.functions.GraftFunctions.registerPercolateHits(
      spark, frozen.nDocs, frozen.sumDl, terms, termDf, termQueries)
    docs
      .withColumn("ws", split(col("text"), " "))
      .withColumn("p", explode(expr(s"$fn(ws)")))
      .filter(col("doc_id") =!= col("p.query_id"))
      .select(col("p.query_id").as("query_id"), col("doc_id"),
        col("p.n").as("n_terms"), col("p.s").as("sum_q"))
  }
}
