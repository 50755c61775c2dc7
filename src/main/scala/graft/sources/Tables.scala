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
