package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Label-store serve diagnostic (r19): absorb an optional synthetic
  * delta into a SigStore root (ids shifted by +1e9 so every doc is
  * new — the store gains patches, a remap, and a size override), then
  * serve `serveComponentsStored` and print wall/cpu plus the AQE-FINAL
  * physical plan's join/aggregate census. The small-scale specs pin the
  * logical shape (no corpus aggregate); this probe verifies the
  * RUNTIME shape at real store sizes — AQE decides broadcast-vs-SMJ
  * from observed stats, which no sf0.001 spec can exercise.
  *
  *   sbt "runMain graft.StoreProbe <storeRoot> [<sfDir> <nDeltaDocs>]"
  *
  * Run it on a COPY of a store you care about: the absorb mutates it.
  */
object StoreProbe {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: StoreProbe <storeRoot> [sfDir nDeltaDocs]")
    val root = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", 128)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.length > 2) {
      val delta = spark.read.parquet(args(1) + "/documents.parquet")
        .select("doc_id", "text").limit(args(2).toInt)
        .withColumn("doc_id", col("doc_id") + 1000000000L)
      val t0 = System.nanoTime()
      graft.operators.SigStore.absorbComponents(spark, root, delta, batchId = 999L)
      println(f"""{"metric":"store_probe_absorb","wall_sec":${(System.nanoTime() - t0) / 1e9}%.3f,"delta_docs":${args(2)}}""")
    }
    def cpuNs(): Long =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime
        case _ => -1L
      }
    // warm once, then time the serve
    graft.operators.SigStore.serveComponentsStored(spark, root).count(): Unit
    val df = graft.operators.SigStore.serveComponentsStored(spark, root)
    val (t0, c0) = (System.nanoTime(), cpuNs())
    val rows = df.count()
    val wall = (System.nanoTime() - t0) / 1e9
    val cpu = if (c0 >= 0) (cpuNs() - c0) / 1e9 else -1.0
    // AQE-final plan census: executedPlan AFTER the action reflects the
    // runtime join strategies, not the static guesses
    val plan = df.queryExecution.executedPlan.toString
    def n(tag: String) = tag.r.findAllIn(plan).length
    println(f"""{"metric":"store_probe_serve","rows":$rows,"wall_sec":$wall%.3f,"cpu_sec":$cpu%.3f,"broadcast_joins":${n("BroadcastHashJoin")},"sort_merge_joins":${n("SortMergeJoin")},"shuffled_hash_joins":${n("ShuffledHashJoin")},"hash_aggregates":${n("HashAggregate")},"exchanges":${n("Exchange")}}""")
    if (sys.env.contains("GRAFT_PROBE_PLAN")) System.err.println(plan)
  }
}
