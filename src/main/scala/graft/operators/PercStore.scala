package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{SaveMode, SparkSession}

import graft.operators.Retrieval.FrozenIndexStats
import graft.sources.Writers

/** Persisted STANDING-QUERY registration for the percolator — the
  * registration half of prospective search, completing the lifecycle
  * the postings store ([[BmStore]]) gives the corpus half. r12's
  * percolation froze an ephemeral per-JVM query set
  * ([[BmStore.frozenStatsForQueries]]): a restart forgot every
  * registered monitor. This module persists registrations BESIDE the
  * postings store they are frozen against, the SigStore idiom
  * throughout:
  *
  *   <bm root>/standing.parquet/batch_id=N/    (query_id, token, df)
  *   <bm root>/standing_tomb.parquet/batch_id=N/ (query_id)
  *
  * == Registration semantics ==
  *
  *  - [[registerBatch]] resolves each query's term df against the
  *    store's frozen `df.parquet` ONCE, at registration time (terms
  *    outside the index vocabulary drop — the percolator's unknown-term
  *    convention), and lands the rows under the batch's own
  *    `batch_id=N` dir via dynamic partition overwrite: a replayed
  *    batch rewrites exactly its own dir (exactly-once, the
  *    appendBatch idiom), and registration cost is O(|batch|), never
  *    O(|standing set|).
  *  - [[removeBatch]] writes query-id tombstones the same way.
  *  - Latest batch wins per query_id: a re-registration REPLACES the
  *    query's term set; a query is live iff its newest registration is
  *    newer than its newest tombstone. Batch ids must be monotone (a
  *    streaming foreachBatch id, the natural source, is).
  *
  * == Serving ==
  *
  * [[loadFrozen]] reads the persisted registrations (one
  * standing-set-sized job — bounded by the MONITOR population, not the
  * corpus), resolves winners driver-side, and assembles the same
  * [[FrozenIndexStats]] the ephemeral freeze produces — so
  * [[graft.streaming.Percolate.scoreIndexed]] serves identical verdicts
  * after a JVM restart with NO rebuild (spec-proven, PercStoreSpec) and
  * the content-addressed [[graft.functions.PercolateHits]] registration
  * reconstructs the identical expression. df values were captured
  * against the store's FROZEN statistics, so a registration outlives
  * corpus growth exactly as the store's staleness contract dictates.
  */
object PercStore {

  private def standingPath(root: String) =
    new Path(root, "standing.parquet").toString
  private def tombPath(root: String) =
    new Path(root, "standing_tomb.parquet").toString

  private def fs(s: SparkSession, p: String) =
    new Path(p).getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Register (or replace) a batch of standing queries against the
    * store at `root`. O(batch): one bucket-pruned df lookup over the
    * batch vocabulary + one `batch_id=N` dir write.
    */
  def registerBatch(s: SparkSession, root: String,
      queries: Seq[(Long, Seq[String])], batchId: Long): Unit = {
    if (queries.isEmpty) return
    import s.implicits._
    val qdf = queries
      .flatMap { case (id, ts) => ts.distinct.map(t => (id, t)) }
      .toDF("query_id", "token")
    val dfT = s.read.parquet(new Path(root, "df.parquet").toString)
      .select("token", "df")
    Writers.writeShards(
      qdf.join(dfT, "token")
        .select("query_id", "token", "df")
        .withColumn("batch_id", lit(batchId)),
      standingPath(root),
      partitionCols = Seq("batch_id"),
      sortCols = Seq("query_id", "token"), mode = SaveMode.Overwrite,
      options = Map("partitionOverwriteMode" -> "dynamic"))
  }

  /** Tombstone a batch of query ids (O(batch), exactly-once like
    * [[registerBatch]]). A later re-registration resurrects the id.
    */
  def removeBatch(s: SparkSession, root: String,
      queryIds: Seq[Long], batchId: Long): Unit = {
    if (queryIds.isEmpty) return
    import s.implicits._
    Writers.writeShards(
      queryIds.toDF("query_id").withColumn("batch_id", lit(batchId)),
      tombPath(root),
      partitionCols = Seq("batch_id"),
      sortCols = Seq("query_id"), mode = SaveMode.Overwrite,
      options = Map("partitionOverwriteMode" -> "dynamic"))
  }

  /** Assemble the live standing set from the persisted state: one
    * standing-set-sized job + the O(standing-vocab) driver collect every
    * freeze pays ([[BmStore.frozenStatsForQueries]]'s contract), then
    * the shared [[Retrieval.assembleFrozen]] layout. Corpus scalars come
    * from the store's frozen meta.
    */
  def loadFrozen(s: SparkSession, root: String): FrozenIndexStats = {
    val (nDocs, sumDl) = BmStore.storeMeta(s, root)
    if (!fs(s, standingPath(root)).exists(new Path(standingPath(root))))
      return Retrieval.assembleFrozen(Array.empty, nDocs, sumDl)
    val reg = s.read.parquet(standingPath(root))
      .select("query_id", "token", "df", "batch_id")
    // newest registration batch per query (latest replaces), minus
    // queries whose newest tombstone is at least as new
    val winner = reg.groupBy("query_id")
      .agg(max("batch_id").as("rb"))
    val live =
      if (!fs(s, tombPath(root)).exists(new Path(tombPath(root)))) winner
      else {
        val tomb = s.read.parquet(tombPath(root))
          .groupBy("query_id").agg(max("batch_id").as("tb"))
        winner.join(tomb, Seq("query_id"), "left")
          .filter(col("tb").isNull || col("rb") > col("tb"))
          .select("query_id", "rb")
      }
    // renamed join keys: `live` derives from `reg`, and a raw self-join
    // on the shared attributes trips Spark's ambiguous-self-join check
    val liveK = live
      .select(col("query_id").as("live_qid"), col("rb"))
    val rows = reg
      .join(liveK, col("query_id") === col("live_qid") &&
        col("batch_id") === col("rb"))
      .select("query_id", "token", "df")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    Retrieval.assembleFrozen(rows, nDocs, sumDl)
  }
}
