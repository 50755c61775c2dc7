package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Output side of the training-data pipeline: write a frame as a
  * hive-partitioned parquet shard layout a downstream trainer (or this
  * engine) can prune.
  *
  * Scale shape:
  *  - `partitionBy` on low-cardinality routing columns → directory-level
  *    partition pruning on read;
  *  - `maxRecordsPerFile` caps shard size so 100 TB yields many
  *    uniformly-sized files instead of one file per (partition, task);
  *  - `repartition(partitionCols)` before the write aligns tasks with
  *    output partitions, so each directory is written by few tasks instead
  *    of every task appending a sliver to every directory (the
  *    small-files explosion);
  *  - `sortWithinPartitions` on the sort columns gives parquet row-group
  *    min/max stats that make later range predicates on those columns
  *    prunable.
  */
object Writers {

  def writeShards(df: DataFrame, outDir: String, partitionCols: Seq[String],
      sortCols: Seq[String], maxRecordsPerFile: Long = 1000000L): Unit = {
    val routed = df
      .repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
    routed.write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(outDir)
  }
}
