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

  /** `events.ts` is parquet TIMESTAMP(NANOS), which vanilla Spark refuses;
    * read it as a nanos long (legacy conf) and truncate to micros — exactly
    * what DuckDB's TIMESTAMP cast does, keeping oracle parity.
    */
  def eventsNormalized(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    // ts_ms = epoch millis (long); ts = TIMESTAMP_NTZ micros, matching how
    // Spark reads the other tables' naive timestamps (and how DuckDB casts
    // ns → TIMESTAMP). Session TZ is pinned UTC so LTZ→NTZ is identity.
    apply(spark, sfDir, "events")
      .withColumn("ts_ms", expr("ts DIV 1000000"))
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")).cast("timestamp_ntz"))
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
