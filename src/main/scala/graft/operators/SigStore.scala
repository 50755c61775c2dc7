package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.sources.Tables

/** Persisted SIGNATURE store for incremental dedup — the dedup analog of
  * [[AnnIndexIO]]'s build-once/serve-many index: `dedup_incremental`
  * recomputes the BASE corpus' simhashes on every run, which is exactly
  * the O(|corpus|) pass a 100 TB ingest pipeline cannot afford per batch.
  * This module banks the base signatures once:
  *
  *   <root>/sigs.parquet/band_id=N/   (band_bits, doc_id, simhash)
  *
  * one row per (doc, pigeonhole band), partitioned by `band_id` and
  * sorted by `band_bits` inside each partition, so the candidate probe is
  * an equi-join against a narrow 16-byte-row table whose row groups are
  * clustered on the join key — the base DOCUMENTS (text payloads) are
  * never read again. Serving a delta batch costs one simhash pass over
  * the DELTA plus the banded join: O(|delta|), never O(|base|).
  *
  * Publish is crash-safe in the AnnIndexIO/compactShards style: build to
  * a `.build_tmp` sibling, then one atomic rename; a torn build is
  * invisible and a replayed build is a no-op (SigStoreSpec asserts the
  * file set survives a second serve untouched).
  *
  * The registered query `dedup_incremental_stored` returns byte-identical
  * rows to `dedup_incremental` (same oracle SQL) — only the base side's
  * provenance changes.
  */
object SigStore {

  /** Bump when the on-disk layout changes: the version is folded into the
    * root digest, so an old store can never be mistaken for the new
    * format (the AnnIndexIO format-version idiom).
    */
  private val FormatVersion = 1

  private def md5hex(sIn: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(sIn.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)

  private[graft] def storeRoot(d: String): String = {
    val canon = try new java.io.File(d).getCanonicalPath catch {
      case _: java.io.IOException => d
    }
    new java.io.File(new java.io.File(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_sigstore"),
      md5hex(s"$canon:v$FormatVersion")).toString
  }

  private def fs(s: SparkSession, p: Path) =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  private[graft] def deleteStore(s: SparkSession, d: String): Unit = {
    val p = new Path(storeRoot(d))
    fs(s, p).delete(p, true)
  }

  /** Build (once per dataset, crash-safe) the banded signature store over
    * the BASE split (`doc_id % 10 =!= 0`, mirroring dedup_incremental).
    */
  private[graft] def ensureBuilt(s: SparkSession, d: String): String =
    synchronized {
      val root = storeRoot(d)
      val rootPath = new Path(root)
      val f = fs(s, rootPath)
      if (!f.exists(new Path(rootPath, "_STORE_READY"))) {
        f.delete(rootPath, true)
        val tmp = new Path(root + ".build_tmp")
        f.delete(tmp, true)
        val base = Dedup.simhash(Tables.documents(s, d))
          .filter(col("doc_id") % 10 =!= 0)
        Dedup.banded7(base)
          .select(col("band_id"), col("band_bits"), col("doc_id"), col("simhash"))
          .repartition(col("band_id"))
          .sortWithinPartitions("band_bits")
          .write.mode(SaveMode.Overwrite).partitionBy("band_id")
          .parquet(new Path(tmp, "sigs.parquet").toString)
        f.create(new Path(tmp, "_STORE_READY")).close()
        require(f.rename(tmp, rootPath), s"atomic publish failed: $root")
      }
      root
    }

  /** dedup_incremental served from the persisted store: identical output,
    * but the base side is the narrow banked table — the only access to
    * `documents` is the one delta-side simhash pass (localCheckpointed,
    * so the serving plan itself contains NO documents scan at all).
    */
  private[graft] def serveIncremental(s: SparkSession, d: String): DataFrame = {
    val root = ensureBuilt(s, d)
    val store = s.read.parquet(s"$root/sigs.parquet")
      .select(col("doc_id").as("base_id"), col("simhash").as("bs"),
        col("band_id"), col("band_bits"))
    val deltaSh = Dedup.simhash(Tables.documents(s, d))
      .filter(col("doc_id") % 10 === 0)
      .localCheckpoint(true)
    val delta = Dedup.banded7(deltaSh)
      .select(col("doc_id").as("delta_id"), col("simhash").as("ds"),
        col("band_id"), col("band_bits"))
    val hits = delta.join(store, Seq("band_id", "band_bits"))
      .select("delta_id", "base_id", "ds", "bs")
      .distinct()
      .withColumn("hamming", expr("cast(bit_count(ds ^ bs) as int)"))
      .filter(col("hamming") <= 6)
      .groupBy("delta_id")
      .agg(count(lit(1)).as("n_dups"), min("hamming").as("min_hamming"))
    deltaSh.select(col("doc_id"))
      .join(hits, col("doc_id") === col("delta_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        coalesce(col("min_hamming"), lit(-1)).as("min_hamming"),
        col("n_dups").isNull.as("is_novel"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_incremental_stored" -> ((s, d) => serveIncremental(s, d))
  )

  /** Output is identical to dedup_incremental by construction, so the
    * oracle is the same SQL — the store only changes where the base
    * signatures come from.
    */
  def oracleSql: Map[String, String] = Map(
    "dedup_incremental_stored" -> Dedup.oracleSql("dedup_incremental")
  )
}
