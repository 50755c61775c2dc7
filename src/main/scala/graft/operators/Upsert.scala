package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.{Tables, Writers}

/** Registered surface for the copy-on-write MERGE primitive
  * ([[graft.sources.Writers.mergeUpsert]]) — the lakehouse maintenance
  * operator a slowly-changing 100 TB corpus needs (document re-crawls,
  * label fixes, late batches) when no transaction-log table format is in
  * play. The PyFlink reference has no table-maintenance surface at all;
  * this rounds out the ingest/compaction/upsert lifecycle with the third
  * leg.
  *
  * The query materializes `documents` as a lang-partitioned layout, merges
  * a deterministic delta (updates to every 7th doc, inserts cloned from
  * every 11th), reads the layout back and aggregates — so the oracle
  * re-derives the exact post-merge table in SQL (delta ∪ base-anti-delta).
  * UpsertSpec separately proves the scale contract: un-touched partition
  * dirs keep their files byte-for-byte (mtimes included), and crash
  * recovery rolls forward/back around the commit marker.
  */
object Upsert {

  private def md5hex(sIn: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(sIn.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Layout version folded into the root digest — bump on layout change. */
  private val LayoutVersion = "v1"

  /** Base-layout root under tmpdir keyed by canonical dataset dir: stable
    * within a round, disposable across rounds (AnnIndexIO convention).
    */
  private[graft] def layoutRoot(d: String): String = {
    val canon = new java.io.File(d).getCanonicalPath
    new java.io.File(
      new java.io.File(sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_merge"),
      md5hex(s"$LayoutVersion|$canon")).toString
  }

  /** Deterministic delta against `documents`: every 7th doc updated
    * (source re-stamped, n_chars + 1), every 11th cloned as an insert
    * under a shifted id. Mirrored literally in the oracle.
    */
  private[graft] def deltaOf(docs: DataFrame): DataFrame = {
    val updates = docs.filter(col("doc_id") % 7 === 0)
      .withColumn("source", lit("merged_update"))
      .withColumn("n_chars", col("n_chars") + 1L)
    val inserts = docs.filter(col("doc_id") % 11 === 0)
      .withColumn("doc_id", col("doc_id") + 10000000L)
      .withColumn("source", lit("merged_insert"))
    updates.unionByName(inserts)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_merge_upsert" -> ((s, d) => {
      val root = layoutRoot(d)
      val rootPath = new Path(root)
      val fs = rootPath.getFileSystem(s.sparkContext.hadoopConfiguration)
      // fresh base each invocation: the query is a pure function of the
      // dataset dir (delete → rebuild → merge → read back)
      fs.delete(rootPath, true)
      val docs = Tables.documents(s, d)
      Writers.writeShards(docs, root, Seq("lang"), Seq("doc_id"))
      Writers.mergeUpsert(s, root, deltaOf(docs),
        keyCols = Seq("doc_id"), partitionCol = "lang", sortCols = Seq("doc_id"))
      s.read.parquet(root)
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_merge_upsert" ->
      """WITH delta AS (
        |  SELECT doc_id, text, lang, 'merged_update' AS source, n_chars + 1 AS n_chars
        |  FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + 10000000, text, lang, 'merged_insert', n_chars
        |  FROM documents WHERE doc_id % 11 = 0
        |), merged AS (
        |  SELECT * FROM delta
        |  UNION ALL
        |  SELECT d.* FROM documents d
        |  WHERE NOT EXISTS (SELECT 1 FROM delta WHERE delta.doc_id = d.doc_id)
        |)
        |SELECT lang, source, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM merged GROUP BY lang, source""".stripMargin
  )
}
