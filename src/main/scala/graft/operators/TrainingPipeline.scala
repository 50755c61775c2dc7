package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.{Tables, Writers}

/** End-to-end training-data materialization — the composition the
  * LLM-pipeline operators exist for (north_star): quality-gate the corpus,
  * drop exact duplicates, collapse near-duplicate clusters to their
  * canonical doc, and write partition-pruned training shards.
  *
  * One declarative plan start-to-finish: the quality/dedup columns are the
  * oracle-checked operators from [[TextOps]] and [[Dedup]] joined back on
  * doc_id, so everything stays partial-aggregated and equi-join shaped —
  * at 100 TB the only data-sized shuffles are the dedup bucket joins and
  * the final repartition-by-output-partition in
  * [[graft.sources.Writers.writeShards]].
  */
object TrainingPipeline {

  /** Filter + dedup decision per document (no side effects): keep iff
    * quality_score ≥ minQuality AND exact-hash canonical AND near-dup
    * cluster canonical.
    */
  def decisions(s: SparkSession, d: String, minQuality: Double): DataFrame = {
    val quality = TextOps.queries("text_quality")(s, d)
      .select(col("doc_id"), col("quality_score"))
    val exact = Dedup.queries("dedup_exact")(s, d)
      .select(col("doc_id"), col("is_canonical").as("exact_canonical"))
    val comp = Dedup.queries("dedup_components")(s, d)
      .select(col("doc_id"), col("is_canonical").as("cluster_canonical"))
    Tables.documents(s, d)
      .join(quality, "doc_id")
      .join(exact, "doc_id")
      .join(comp, "doc_id")
      .withColumn("keep",
        col("quality_score") >= minQuality &&
          col("exact_canonical") && col("cluster_canonical"))
  }

  /** Materialize the kept documents as lang-partitioned parquet shards and
    * return a one-row per-stage funnel summary (total → quality pass →
    * exact canonical → kept).
    */
  def materialize(s: SparkSession, d: String, outDir: String,
      minQuality: Double = 0.5): DataFrame = {
    val dec = decisions(s, d, minQuality)
    Writers.writeShards(
      dec.filter(col("keep"))
        .drop("exact_canonical", "cluster_canonical", "keep"),
      outDir, partitionCols = Seq("lang"), sortCols = Seq("doc_id"))
    dec.agg(
      count(lit(1)).as("total_docs"),
      sum(when(col("quality_score") >= minQuality, 1L).otherwise(0L)).as("quality_pass"),
      sum(when(col("exact_canonical"), 1L).otherwise(0L)).as("exact_canonical"),
      sum(when(col("cluster_canonical"), 1L).otherwise(0L)).as("cluster_canonical"),
      sum(when(col("keep"), 1L).otherwise(0L)).as("kept"))
  }

  /** Oracle-checked surface: the per-doc decision vector. Hash-matching
    * this against DuckDB pins the whole funnel — quality expression,
    * exact-hash canonicalization, and the near-dup connected-components
    * fixpoint — in one query.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "training_decisions" -> ((s, d) =>
      decisions(s, d, 0.5).select(
        "doc_id", "quality_score", "exact_canonical", "cluster_canonical", "keep"))
  )

  def oracleSql: Map[String, String] = Map(
    "training_decisions" ->
      s"""WITH RECURSIVE ${TextOps.wsCte}, ${TextOps.qualityCte},
         |${Dedup.componentsCte},
         |ex AS (SELECT doc_id,
         |  doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS exact_canonical
         |  FROM documents)
         |SELECT d.doc_id, q.quality_score, ex.exact_canonical,
         |  (lab.cluster_id = d.doc_id) AS cluster_canonical,
         |  (q.quality_score >= 0.5 AND ex.exact_canonical
         |    AND lab.cluster_id = d.doc_id) AS keep
         |FROM documents d
         |JOIN q USING (doc_id) JOIN ex USING (doc_id) JOIN lab USING (doc_id)""".stripMargin
  )

  /** `sbt "runMain graft.operators.TrainingPipeline <sfDir> <outDir> [minQuality]"` */
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("training_shards").toString
    val minQuality = if (args.length > 2) args(2).toDouble else 0.5
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    materialize(spark, sfDir, outDir, minQuality).show(truncate = false)
    println(s"SHARDS_AT=$outDir")
    spark.stop()
  }
}
