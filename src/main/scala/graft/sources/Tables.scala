package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's parquet testdata (TESTDATA.md). One parquet file
  * per table under `$sfDir/<name>.parquet`; schemas in FIXTURES.md §B.
  * Plain `spark.read.parquet` keeps the scan a v2 `BatchScan` with full
  * filter pushdown / column pruning — the 100 TB path is the same code with
  * a bigger directory.
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` has shipped under two physical parquet types across fixture
    * generations: TIMESTAMP(NANOS) (which vanilla Spark refuses — readable
    * only as a nanos long via the legacy conf) and TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) (which Spark reads natively as TIMESTAMP_NTZ).
    * Branch on the dtype the scan actually produces so either generation
    * normalizes to the same surface: `ts_ms` = epoch millis (long), `ts` =
    * TIMESTAMP_NTZ micros. DuckDB oracles use `epoch_ms(ts)`, which handles
    * µs natively, so the oracle side is generation-independent too.
    */
  def eventsNormalized(spark: SparkSession, sfDir: String): DataFrame = {
    // Harmless for µs data (the conf only affects NANOS columns), required
    // for the ns generation — set before schema inference either way.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val raw = apply(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // Legacy nanos-as-long read: truncate ns → ms / µs. Session TZ is
        // pinned UTC so the NTZ interpretation matches DuckDB's cast.
        raw
          .withColumn("ts_ms", expr("ts DIV 1000000"))
          .withColumn("ts", timestamp_micros(expr("ts DIV 1000")).cast("timestamp_ntz"))
      case _ =>
        // Native TIMESTAMP_NTZ (or LTZ) micros. unix_millis needs LTZ; the
        // NTZ→LTZ cast is identity under the UTC-pinned session TZ.
        raw
          .withColumn("ts_ms", unix_millis(col("ts").cast("timestamp")))
          .withColumn("ts", col("ts").cast("timestamp_ntz"))
    }
  }

  /** Cheap content fingerprint of one table's backing files (name, length,
    * mtime per part file — no data read). Per-dir model caches
    * ([[graft.operators.Similarity]]'s trained index/centroids/counts,
    * [[graft.operators.Dedup]]'s plan-stats scalars) key on
    * `dir@fingerprint` instead of the bare dir path, so a dataset dir
    * REWRITTEN IN PLACE (long-running JVM serving a refreshed corpus,
    * tests reusing a temp path) naturally misses the cache and retrains —
    * previously the only invalidation path was the manual test seam
    * (ADVICE r10). Listing a handful of part files is microseconds; the
    * caches' getOrElseUpdate still bounds real work to once per content
    * version.
    */
  def tableFingerprint(sfDir: String, name: String): String = {
    // Probe through Hadoop FS, not java.io.File (ADVICE r11 / the
    // adbb42e overlap-store fix): on an HDFS/S3 dataset root a local-File
    // probe never sees the files, the fingerprint collapses to the
    // constant "absent" hash, and an in-place rewrite would serve stale
    // cached models. The active session's hadoopConfiguration resolves
    // the scheme; a bare Configuration covers the no-session case
    // (file:// only — exactly where java.io.File was correct anyway).
    val conf = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    val root = new org.apache.hadoop.fs.Path(s"$sfDir/$name.parquet")
    val fs = root.getFileSystem(conf)
    def walk(st: org.apache.hadoop.fs.FileStatus): Seq[org.apache.hadoop.fs.FileStatus] =
      if (st.isDirectory)
        fs.listStatus(st.getPath).sortBy(_.getPath.getName).toSeq.flatMap(walk)
      else Seq(st)
    val parts =
      if (fs.exists(root))
        walk(fs.getFileStatus(root))
          .map(st => s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
      else Seq("absent")
    Integer.toHexString(scala.util.hashing.MurmurHash3.orderedHash(parts))
  }

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
