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
    * format (the AnnIndexIO format-version idiom). v2: band partitions
    * gained `batch_id=<n>` sub-dirs so streamed growth commits
    * exactly-once per micro-batch (base build publishes as batch_id=-1).
    */
  private val FormatVersion = 2

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

  /** Banded (band_id, band_bits, doc_id, simhash) rows for a documents
    * frame — the store's row shape.
    */
  private def bandedSigs(docs: DataFrame): DataFrame =
    Dedup.banded7(Dedup.simhash(docs))
      .select(col("band_id"), col("band_bits"), col("doc_id"), col("simhash"))

  /** Build a store at `root` (crash-safe: staged + atomic rename) from an
    * arbitrary base documents frame. Base rows publish as `batch_id=-1`.
    */
  private[graft] def buildFrom(s: SparkSession, root: String,
      baseDocs: DataFrame): Unit = {
    val rootPath = new Path(root)
    val f = fs(s, rootPath)
    f.delete(rootPath, true)
    val tmp = new Path(root + ".build_tmp")
    f.delete(tmp, true)
    bandedSigs(baseDocs)
      .withColumn("batch_id", lit(-1L))
      .repartition(col("band_id"))
      .sortWithinPartitions("band_bits")
      .write.mode(SaveMode.Overwrite).partitionBy("band_id", "batch_id")
      .parquet(new Path(tmp, "sigs.parquet").toString)
    f.create(new Path(tmp, "_STORE_READY")).close()
    require(f.rename(tmp, rootPath), s"atomic publish failed: $root")
  }

  /** Grow a published store by one micro-batch of NEW base documents:
    * the batch's signature rows land under their own `batch_id=<n>`
    * sub-dirs inside the band partitions via dynamic partition overwrite,
    * so a replayed micro-batch rewrites exactly its own dirs — the
    * streaming.Ingest exactly-once idiom, identical to
    * AnnIndexIO.appendBatch. Growth costs one simhash pass over the
    * batch: O(|batch|), never O(|store|).
    */
  private[graft] def appendBatch(s: SparkSession, root: String,
      docsBatch: DataFrame, batchId: Long): Unit =
    graft.sources.Writers.writeShards(
      bandedSigs(docsBatch).withColumn("batch_id", lit(batchId)),
      new Path(root, "sigs.parquet").toString,
      partitionCols = Seq("band_id", "batch_id"),
      sortCols = Seq("band_bits"), mode = SaveMode.Overwrite,
      options = Map("partitionOverwriteMode" -> "dynamic"))

  /** Maintenance for a long-streamed store: every band partition accretes
    * one `batch_id=<n>` dir per micro-batch; fold the cold ones into a
    * bounded-file generation via the shared crash-safe protocol
    * (write-new generation → swap → manifest-healed delete; the hottest
    * batch dir stays protected so an in-flight replay remains
    * idempotent) — the same code path as AnnIndexIO.compactCells and the
    * ingest layout.
    */
  private[graft] def compactBands(s: SparkSession, root: String)
      : Seq[graft.sources.Writers.CompactionStats] = {
    val sigs = new Path(root, "sigs.parquet")
    val f = fs(s, sigs)
    if (!f.exists(sigs)) Seq.empty
    else f.listStatus(sigs).filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith("band_id="))
      .map(band => graft.sources.Writers.compactPartitionInternal(
        s, sigs.toString, band, dropCols = Seq("band_id", "batch_id"),
        targetFileBytes = 128L * 1024 * 1024, maxRecordsPerFile = 1000000L,
        sortCols = Seq("band_bits"), crashBeforeDelete = false)).toSeq
  }

  /** Build (once per dataset, crash-safe) the banded signature store over
    * the BASE split (`doc_id % 10 =!= 0`, mirroring dedup_incremental).
    */
  private[graft] def ensureBuilt(s: SparkSession, d: String): String =
    synchronized {
      val root = storeRoot(d)
      if (!fs(s, new Path(root)).exists(new Path(root, "_STORE_READY")))
        buildFrom(s, root,
          Tables.documents(s, d).filter(col("doc_id") % 10 =!= 0))
      root
    }

  /** dedup_incremental served from the persisted store: identical output,
    * but the base side is the narrow banked table — the only access to
    * `documents` is the one delta-side simhash pass (localCheckpointed,
    * so the serving plan itself contains NO documents scan at all).
    */
  private[graft] def serveIncremental(s: SparkSession, d: String): DataFrame =
    serveAgainst(s, ensureBuilt(s, d),
      Tables.documents(s, d).filter(col("doc_id") % 10 === 0))

  /** Grade an arbitrary delta documents frame against the store at
    * `root` — same verdict shape as dedup_incremental.
    */
  private[graft] def serveAgainst(s: SparkSession, root: String,
      deltaDocs: DataFrame): DataFrame = {
    val store = s.read.parquet(s"$root/sigs.parquet")
      .select(col("doc_id").as("base_id"), col("simhash").as("bs"),
        col("band_id"), col("band_bits"))
    val deltaSh = Dedup.simhash(deltaDocs).localCheckpoint(true)
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
