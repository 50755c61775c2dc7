package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}

import graft.operators.Retrieval.FrozenIndexStats
import graft.sources.Tables

/** Persisted POSTINGS store for lexical (BM25) retrieval — the retrieval
  * family's build-once/serve-many index, completing the lifecycle
  * pattern its siblings already have (ANN: [[AnnIndexIO]]; dedup:
  * [[SigStore]]). `text_bm25_topk` recomputes tf/df/avgdl from the
  * documents table on every run — exactly the O(|corpus|) pass a 100 TB
  * deployment pays ONCE at index-build time, never per query. This
  * module banks that pass:
  *
  *   <root>/postings.parquet/tok_bucket=N/batch_id=M/  (token, doc_id, tf, dl)
  *   <root>/df.parquet/tok_bucket=N/                   (token, df)   [vocab-sized]
  *   <root>/meta.parquet                               (n_docs, sum_dl) [1 row]
  *   <root>/_STORE_READY                               publish marker
  *
  * == Layout = the serving plan ==
  *
  * Postings partition by `tok_bucket = xxhash64(token) % `[[NumBuckets]]
  * and sort by `token` inside each file: a query whose union vocabulary
  * hashes into k buckets reads k directories and SKIPS the rest at the
  * parquet-partition level (the [[AnnIndexIO]] nprobe idiom — the spec
  * asserts the pruned scan), and the token IN (…) filter then prunes row
  * groups inside them via the sorted column's min/max stats. The one
  * shuffle in a serve carries candidate postings only; the corpus text is
  * never touched — the serving plan contains NO documents scan at all
  * (query-term statistics are frozen driver-side, below). At 100 TB the
  * same layout holds with more buckets; each serve touches
  * `|query vocab buckets| / NumBuckets` of the postings files.
  *
  * == Frozen statistics (the staleness contract) ==
  *
  * [[frozenStats]] materializes the standing-query statistics from the
  * STORE — per-term df from `df.parquet`, corpus scalars from
  * `meta.parquet` — one O(query-vocab) driver collect at index-refresh
  * time, identical in role (and in type: [[FrozenIndexStats]]) to the
  * batch [[Retrieval.frozenStats]] and to [[AnnServe]]'s frozen
  * centroids. The streaming percolator serves from the same frozen
  * object, so batch serve / incremental serve / percolation all score
  * against one statistics snapshot.
  *
  * == Incremental growth ==
  *
  * [[appendBatch]] lands a new document batch's postings under their own
  * `batch_id=<n>` dirs inside the bucket partitions (dynamic partition
  * overwrite — the exactly-once replay idiom shared with
  * SigStore.appendBatch / AnnIndexIO.appendBatch): growth costs one
  * tokenize pass over the BATCH, O(|batch|), never O(|store|).
  * df / avgdl / N stay FROZEN at the base build — the same staleness
  * contract real search engines run between index rebuilds (and the same
  * shape as AnnIndexIO's frozen-model incremental encode): grown
  * documents are retrievable immediately, but idf drift accrues until
  * the next full rebuild re-freezes the statistics. A batch term absent
  * from the frozen vocabulary scores zero (unknown term), exactly as a
  * percolator treats out-of-vocabulary tokens. `text_bm25_incremental`'s
  * oracle mirrors the contract literally: postings over the full corpus,
  * dfq/st over the base split only.
  *
  * [[compactBuckets]] folds a long-grown store's per-batch dirs into
  * bounded-file generations via the shared crash-safe protocol
  * (Writers.compactPartitionInternal), same as AnnIndexIO.compactCells.
  *
  * Publish is crash-safe in the SigStore style: build to a `.build_tmp`
  * sibling, one atomic rename; a torn build is invisible.
  *
  * Not a reference operator (the reference is a streaming fraud demo,
  * SURVEY §0) — this closes VERDICT r11 gap #2 (lexical retrieval was
  * the one family without a persisted lifecycle).
  */
object BmStore {

  /** Token-hash partition count. 16 keeps sf-fixture directories
    * non-trivial while every bucket still holds many tokens; at 100 TB
    * the knob scales to thousands — bucket count is the pruning
    * granularity, independent of corpus size.
    */
  val NumBuckets = 16

  private val FormatVersion = 1

  private def md5hex(sIn: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(sIn.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)

  /** Keyed by canonical dataset PATH (the SigStore/AnnIndexIO
    * convention): a dataset dir whose CONTENT is rewritten in place must
    * [[deleteStore]] first — same caveat as `AnnIndexIO.deleteIndex` /
    * `Similarity.clearAnnIndexCache`.
    */
  private[graft] def storeRoot(d: String, variant: String): String = {
    val canon = try new java.io.File(d).getCanonicalPath catch {
      case _: java.io.IOException => d
    }
    new java.io.File(new java.io.File(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_bmstore"),
      variant + "_" + md5hex(s"$canon:v$FormatVersion")).toString
  }

  private def fs(s: SparkSession, p: Path) =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  private[graft] def deleteStore(s: SparkSession, d: String): Unit =
    Seq("full", "incr").foreach { v =>
      val p = new Path(storeRoot(d, v))
      fs(s, p).delete(p, true)
      frozenCache.remove(storeRoot(d, v))
      metaCache.remove(storeRoot(d, v))
    }

  private def tokBucket(c: Column): Column =
    pmod(xxhash64(c), lit(NumBuckets.toLong)).cast("int")

  /** (doc_id, dl, token, tf) — one tokenize pass over a documents frame;
    * the same token/dl derivation as [[Retrieval.bmScored]] so stored
    * postings are definitionally the batch scorer's tf frame.
    */
  private def tfRows(docs: DataFrame): DataFrame =
    docs.select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("dl"),
        explode(split(col("text"), " ")).as("token"))
      .groupBy("doc_id", "dl", "token")
      .agg(count(lit(1)).as("tf"))

  /** Build a store at `root` from a base documents frame (crash-safe:
    * staged + atomic rename). Base postings publish as `batch_id=-1`.
    * ONE corpus pass: the materialized tf frame feeds postings AND df.
    */
  private[graft] def buildFrom(s: SparkSession, root: String,
      baseDocs: DataFrame): Unit = {
    val rootPath = new Path(root)
    val f = fs(s, rootPath)
    val tmp = new Path(root + ".build_tmp")
    f.delete(tmp, true)
    val tf = tfRows(baseDocs).transform(Materialize.once)
    tf.withColumn("tok_bucket", tokBucket(col("token")))
      .withColumn("batch_id", lit(-1L))
      .repartition(col("tok_bucket"))
      .sortWithinPartitions("token", "doc_id")
      .write.mode(SaveMode.Overwrite).partitionBy("tok_bucket", "batch_id")
      .parquet(new Path(tmp, "postings.parquet").toString)
    // df is a re-aggregation of tf rows (distinct (doc, token) pairs) —
    // no second corpus pass; bucketed like the postings so a frozen-stats
    // refresh over a huge vocabulary prunes the same way
    tf.groupBy("token").agg(count(lit(1)).as("df"))
      .withColumn("tok_bucket", tokBucket(col("token")))
      .repartition(col("tok_bucket"))
      .sortWithinPartitions("token")
      .write.mode(SaveMode.Overwrite).partitionBy("tok_bucket")
      .parquet(new Path(tmp, "df.parquet").toString)
    // meta derives from the MATERIALIZED tf frame (every doc has >= 1
    // token row — split never yields an empty array — so the distinct
    // (doc_id, dl) set covers the corpus exactly): a direct baseDocs
    // aggregate would re-scan and re-tokenize the full corpus text for
    // two scalars (self-review r12 — the build really is ONE corpus pass)
    tf.select("doc_id", "dl").distinct()
      .agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite)
      .parquet(new Path(tmp, "meta.parquet").toString)
    Materialize.drop(tf)
    f.create(new Path(tmp, "_STORE_READY")).close()
    f.delete(rootPath, true)
    require(f.rename(tmp, rootPath), s"bm store publish failed: $root")
  }

  /** Grow a published store by one micro-batch of NEW documents: the
    * batch's postings land under their own `batch_id=<n>` dirs via
    * dynamic partition overwrite (replay rewrites exactly its own dirs).
    * df/meta are NOT touched — the frozen-statistics contract above.
    */
  private[graft] def appendBatch(s: SparkSession, root: String,
      docsBatch: DataFrame, batchId: Long): Unit =
    graft.sources.Writers.writeShards(
      tfRows(docsBatch)
        .withColumn("tok_bucket", tokBucket(col("token")))
        .withColumn("batch_id", lit(batchId)),
      new Path(root, "postings.parquet").toString,
      partitionCols = Seq("tok_bucket", "batch_id"),
      sortCols = Seq("token", "doc_id"), mode = SaveMode.Overwrite,
      options = Map("partitionOverwriteMode" -> "dynamic"))

  /** Fold a long-streamed store's cold per-batch dirs into bounded-file
    * generations, one bucket at a time (the shared crash-safe protocol;
    * the hottest batch dir stays protected so an in-flight replay
    * remains idempotent).
    */
  private[graft] def compactBuckets(s: SparkSession, root: String)
      : Seq[graft.sources.Writers.CompactionStats] = {
    val postings = new Path(root, "postings.parquet")
    val f = fs(s, postings)
    if (!f.exists(postings)) Seq.empty
    else f.listStatus(postings).filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith("tok_bucket="))
      .map(b => graft.sources.Writers.compactPartitionInternal(
        s, postings.toString, b, dropCols = Seq("tok_bucket", "batch_id"),
        targetFileBytes = 128L * 1024 * 1024, maxRecordsPerFile = 1000000L,
        sortCols = Seq("token", "doc_id"), crashBeforeDelete = false)).toSeq
  }

  /** One frozen-stats collect per store root per JVM — refreshed by
    * [[deleteStore]] (a rebuilt store gets a new freeze; appends don't
    * change frozen statistics BY CONTRACT, so the cache stays valid
    * across growth).
    */
  private val frozenCache =
    scala.collection.concurrent.TrieMap.empty[String, FrozenIndexStats]

  /** (n_docs, sum_dl) per store root — frozen for the store's lifetime
    * by contract, so the one-row meta read happens once per JVM instead
    * of once per serving micro-batch (self-review r12: BmServe pays
    * frozenStatsForQueries per batch).
    */
  private val metaCache =
    scala.collection.concurrent.TrieMap.empty[String, (Long, Long)]

  private def storeMeta(s: SparkSession, root: String): (Long, Long) =
    metaCache.getOrElseUpdate(root, {
      val m = s.read.parquet(new Path(root, "meta.parquet").toString).head()
      (m.getLong(0), m.getLong(1))
    })

  /** Materialize the standing-query statistics FROM the store: per-term
    * df from `df.parquet` (bucket-pruned lookup), scalars from
    * `meta.parquet`. The only documents access is the O(Q) IN-pushed
    * read of the 20 query docs' text (the AnnIndexIO
    * read-the-query-vectors idiom) — it happens HERE, at freeze time,
    * never in a serving plan. df values equal the batch
    * [[Retrieval.frozenStats]]'s by construction (both are distinct-doc
    * counts over the same tf definition) — spec-asserted.
    */
  private[graft] def frozenStats(s: SparkSession, root: String, d: String): FrozenIndexStats =
    frozenCache.getOrElseUpdate(root, {
      val qt = Tables.documents(s, d)
        .filter(Retrieval.isQueryDoc(col("doc_id")))
        .select(col("doc_id").as("query_id"),
          explode(split(col("text"), " ")).as("token"))
        .distinct()
      val dfT = s.read.parquet(new Path(root, "df.parquet").toString)
        .select("token", "df")
      val rows = qt.join(dfT, "token")
        .select("query_id", "token", "df").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      val (nDocs, sumDl) = storeMeta(s, root)
      Retrieval.assembleFrozen(rows, nDocs, sumDl)
    })

  /** Freeze statistics for an ARBITRARY standing-query set (query_id →
    * term list) against the store — the prospective-search registration
    * path: user-authored standing queries, not corpus docs. Terms absent
    * from the index vocabulary are dropped (unknown terms score nothing,
    * the percolator convention). One O(standing-vocab) df lookup; no
    * corpus access at all.
    */
  private[graft] def frozenStatsForQueries(s: SparkSession, root: String,
      queries: Seq[(Long, Seq[String])]): FrozenIndexStats = {
    import s.implicits._
    val qdf = queries
      .flatMap { case (id, ts) => ts.distinct.map(t => (id, t)) }
      .toDF("query_id", "token")
    val dfT = s.read.parquet(new Path(root, "df.parquet").toString)
      .select("token", "df")
    val rows = qdf.join(dfT, "token")
      .select("query_id", "token", "df").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val (nDocs, sumDl) = storeMeta(s, root)
    Retrieval.assembleFrozen(rows, nDocs, sumDl)
  }

  /** Deterministic synthetic standing queries drawn from the store's
    * vocabulary — the registration-path fixture shared by StreamBench's
    * Q=1000 percolation rows and PercolateSpec's parity test (one
    * definition so bench and spec cannot drift apart, self-review r12).
    * floorMod, not abs: abs(Int.MinValue) is negative.
    */
  private[graft] def syntheticStandingQueries(s: SparkSession, root: String,
      prefix: String, n: Int, termsPerQuery: Int = 8): Seq[(Long, Seq[String])] = {
    val vocab = s.read.parquet(new Path(root, "df.parquet").toString)
      .select("token").collect().map(_.getString(0)).sorted
    (0 until n).map { qid =>
      val terms = (0 until termsPerQuery).map(j => vocab(
        math.floorMod(scala.util.hashing.MurmurHash3.stringHash(s"$prefix$qid:$j"),
          vocab.length)))
      (1000000L + qid, terms.distinct.toSeq)
    }
  }

  /** (query_id, doc_id, n_terms, sum_q) scored purely from the store:
    * the standing-query terms ride in as a broadcast LOCAL RELATION
    * (flattened from the frozen stats — no corpus side), the postings
    * scan is statically pruned to the union vocabulary's buckets, and
    * the scoring arithmetic reproduces [[Retrieval.bmScored]]'s
    * expression tree with the frozen scalars spliced as long literals
    * (long-literal division = the batch's long-column division, so
    * served sum_q is bit-identical to batch sum_q over the same
    * corpus+stats snapshot).
    */
  private[graft] def servedScored(s: SparkSession, root: String,
      frozen: FrozenIndexStats): DataFrame = {
    import s.implicits._
    val qdf = frozen.queries
      .flatMap(q => q.terms.map(t => (q.query_id, t.term, t.df)))
      .toDF("query_id", "token", "df")
    // bucket literals for the static prune: one tiny job over the union
    // vocabulary (a local relation — no store or corpus access)
    val buckets = frozen.unionTerms.toDF("token")
      .select(tokBucket(col("token")).as("b")).distinct()
      .as[Int].collect().sorted.toSeq
    s.read.parquet(new Path(root, "postings.parquet").toString)
      .filter(col("tok_bucket").isin(buckets: _*))
      .filter(col("token").isin(frozen.unionTerms: _*))
      .join(broadcast(qdf), "token")
      .filter(col("doc_id") =!= col("query_id"))
      .withColumn("idf",
        log(lit(1.0) + (lit(frozen.nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("tfw",
        col("tf") * lit(2.2) / (col("tf") +
          lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / (lit(frozen.sumDl) / lit(frozen.nDocs)))))
      .withColumn("q", round(col("idf") * col("tfw") * lit(1e6)).cast("long"))
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).cast("int").as("n_terms"), sum("q").as("sum_q"))
  }

  /** Served candidates ranked per query to depth k — the serving twin of
    * Retrieval's bmRanked (same salted two-stage top-k, same total
    * order), shared with the hybrid fusion.
    */
  private[graft] def servedRanked(s: SparkSession, root: String,
      frozen: FrozenIndexStats, k: Int): DataFrame =
    Similarity.twoStageTopKBy(servedScored(s, root, frozen), k,
      col("query_id"), xxhash64(col("doc_id")),
      Seq(col("sum_q").desc, col("doc_id")))

  /** Ranked results in the text_bm25_topk display shape (integer-space
    * HALF_UP score) — shared by the batch serves and [[graft.streaming.BmServe]].
    */
  private[graft] def serveDisplay(s: SparkSession, root: String,
      frozen: FrozenIndexStats, k: Int): DataFrame =
    servedRanked(s, root, frozen, k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("n_terms"),
        (expr("(sum_q + 50) div 100") / lit(1e4)).as("score"))

  private def serveTopK(s: SparkSession, root: String, d: String): DataFrame =
    serveDisplay(s, root, frozenStats(s, root, d), Retrieval.BmTopK)

  /** Build the full-corpus store once per dataset dir (crash-safe). */
  private[graft] def ensureFullBuilt(s: SparkSession, d: String): String =
    synchronized {
      val root = storeRoot(d, "full")
      if (!fs(s, new Path(root)).exists(new Path(root, "_STORE_READY")))
        buildFrom(s, root, Tables.documents(s, d))
      root
    }

  /** Base store over `doc_id % 10 <> 0` (the SigStore split) + the delta
    * appended as one batch with statistics frozen at the base build —
    * marker-guarded so a replay is a no-op.
    */
  private[graft] def ensureIncrBuilt(s: SparkSession, d: String): String =
    synchronized {
      val root = storeRoot(d, "incr")
      val f = fs(s, new Path(root))
      if (!f.exists(new Path(root, "_STORE_READY")))
        buildFrom(s, root,
          Tables.documents(s, d).filter(col("doc_id") % 10 =!= 0))
      val marker = new Path(root, "_DELTA_APPENDED")
      if (!f.exists(marker)) {
        appendBatch(s, root,
          Tables.documents(s, d).filter(col("doc_id") % 10 === 0), 0L)
        f.create(marker).close()
      }
      root
    }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // text_bm25_topk served from the durable postings store: first call
    // pays the one-time build pass; the serve itself reads postings only.
    // Output — and therefore the oracle — is identical to the in-memory
    // text_bm25_topk.
    "text_bm25_served_topk" -> ((s, d) =>
      serveTopK(s, ensureFullBuilt(s, d), d)),
    // base-built store + appended delta served under FROZEN df/avgdl/N:
    // the ranking a real deployment serves between index rebuilds. The
    // oracle mirrors the staleness contract exactly (full postings,
    // base-only statistics).
    "text_bm25_incremental" -> ((s, d) =>
      serveTopK(s, ensureIncrBuilt(s, d), d)),
    // Hybrid RRF served FROM INDEXES — both fusion legs read persisted
    // structures: BM25 ranks from this postings store, cosine ranks from
    // the IVF×PQ code table (AnnIndexIO.serveVectors, nprobe=2 partition-
    // pruned ADC). This replaces `ann_hybrid_rrf`'s O(Q·n) brute-force
    // cosine scan in the headline baskets (VERDICT r11 "what's wrong" #1);
    // the brute-force fusion stays registered as the exact oracle twin.
    // PQ ranks are approximate-but-deterministic, so the fused output is
    // still hash-checked — the oracle composes the served CTEs (frozen
    // centroids/codebooks arithmetic) exactly as ann_ivfpq_served_topk's
    // does. The only corpus-table access is the O(Q) IN-pushed read of
    // the 20 query embeddings at serve setup.
    "ann_hybrid_served_rrf" -> ((s, d) => {
      import Retrieval.{FuseDepth, RrfK, RrfTopK}
      val bmRoot = ensureFullBuilt(s, d)
      val bmr = servedRanked(s, bmRoot, frozenStats(s, bmRoot, d), FuseDepth)
        .select(col("query_id"), col("doc_id"), col("rank").as("r_bm"))
      val annRoot = AnnIndexIO.ensureFullBuilt(s, d)
      val qs = Similarity.withEmb(s, d)
        .filter(Retrieval.isQueryDoc(col("vec_id")))
        .select("vec_id", "emb").collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
      val cr = AnnIndexIO.serveVectors(s, annRoot, qs, FuseDepth)
        .select(col("query_id"), col("vec_id").as("doc_id"),
          col("rank").as("r_cos"))
      val fused = bmr.join(cr, Seq("query_id", "doc_id"), "full_outer")
        .withColumn("rrf", round(
          coalesce(lit(1.0) / (lit(RrfK) + col("r_bm")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(RrfK) + col("r_cos")), lit(0.0)), 6))
        .withColumn("r_bm", coalesce(col("r_bm"), lit(0)).cast("int"))
        .withColumn("r_cos", coalesce(col("r_cos"), lit(0)).cast("int"))
      Similarity.twoStageTopKBy(fused, RrfTopK, col("query_id"),
          xxhash64(col("doc_id")), Seq(col("rrf").desc, col("doc_id")))
        .select("query_id", "rank", "doc_id", "r_bm", "r_cos", "rrf")
    }),
    // Quality accounting for the index-served fusion: per-query overlap@10
    // between the exact fusion (brute-force cosine leg) and the served
    // fusion (PQ-approximate leg) — the number that tells an operator how
    // much ranking quality the PQ compression trades for the index-served
    // plan, the ann_recall idiom applied to fusion. Both inputs are
    // deterministic and individually hash-matched, so the grader itself
    // stays oracle-checked.
    "ann_hybrid_agreement" -> ((s, d) => {
      val exact = Retrieval.queries("ann_hybrid_rrf")(s, d)
        .select("query_id", "doc_id")
      val served = queries("ann_hybrid_served_rrf")(s, d)
        .select(col("query_id"), col("doc_id")).withColumn("m", lit(1L))
      exact.join(served, Seq("query_id", "doc_id"), "left")
        .groupBy("query_id")
        .agg(sum(coalesce(col("m"), lit(0L))).as("hits"))
        // hits/10 is exact at one decimal — no rounding seam
        .withColumn("overlap_at_10", round(col("hits") / lit(10.0), 2))
        .select("query_id", "hits", "overlap_at_10")
    })
  )

  // BM25 leg = the full-stats bm CTEs ranked to FuseDepth; cosine leg =
  // the IVF×PQ served CTEs over the Retrieval query basket (nested WITH
  // scoping, the ann_recall composition idiom); fusion identical to
  // ann_hybrid_rrf's. A lazy val so the agreement oracle can compose it
  // without re-entering the oracleSql map builder.
  private lazy val hybridServedSql: String =
      s"""WITH ${Retrieval.bmCtesFor(statsBaseOnly = false)}
         |${Retrieval.bmScoreCtes},
         |bmr AS (SELECT query_id, doc_id, rank r_bm FROM (
         |          SELECT *, CAST(row_number() OVER (
         |            PARTITION BY query_id ORDER BY sum_q DESC, doc_id) AS INT) rank
         |          FROM bm) WHERE rank <= ${Retrieval.FuseDepth}),
         |cr AS (SELECT query_id, vec_id doc_id, rank r_cos FROM (
         |${Similarity.ivfpqOracleFor(Retrieval.queryIdsSql, Retrieval.FuseDepth)}
         |)),
         |f AS (SELECT coalesce(b.query_id, c.query_id) query_id,
         |        coalesce(b.doc_id, c.doc_id) doc_id,
         |        CAST(coalesce(b.r_bm, 0) AS INT) r_bm,
         |        CAST(coalesce(c.r_cos, 0) AS INT) r_cos,
         |        round(coalesce(1.0::DOUBLE / (${Retrieval.RrfK} + b.r_bm), 0.0::DOUBLE) +
         |              coalesce(1.0::DOUBLE / (${Retrieval.RrfK} + c.r_cos), 0.0::DOUBLE), 6) rrf
         |      FROM bmr b FULL OUTER JOIN cr c
         |        ON b.query_id = c.query_id AND b.doc_id = c.doc_id)
         |SELECT query_id, rank, doc_id, r_bm, r_cos, rrf FROM (
         |  SELECT *, CAST(row_number() OVER (
         |    PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS INT) rank
         |  FROM f) WHERE rank <= ${Retrieval.RrfTopK}""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "text_bm25_served_topk" -> Retrieval.oracleSql("text_bm25_topk"),
    "text_bm25_incremental" ->
      s"""WITH ${Retrieval.bmCtesFor(statsBaseOnly = true)}
         |${Retrieval.bmScoreCtes}
         |${Retrieval.bmTopKSelect}""".stripMargin,
    "ann_hybrid_served_rrf" -> hybridServedSql,
    // composes the two (individually hash-matched) fusion oracles as
    // nested CTE subqueries — the annRecallSql idiom
    "ann_hybrid_agreement" ->
      s"""WITH ex AS (${Retrieval.oracleSql("ann_hybrid_rrf")}),
         |sv AS (SELECT query_id, doc_id FROM (
         |$hybridServedSql
         |))
         |SELECT ex.query_id, sum(CASE WHEN sv.doc_id IS NULL THEN 0 ELSE 1 END)::BIGINT hits,
         |  round(sum(CASE WHEN sv.doc_id IS NULL THEN 0 ELSE 1 END) / 10.0, 2) overlap_at_10
         |FROM ex LEFT JOIN sv ON sv.query_id = ex.query_id AND sv.doc_id = ex.doc_id
         |GROUP BY ex.query_id""".stripMargin
  )
}
