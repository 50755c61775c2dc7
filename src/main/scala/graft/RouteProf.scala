package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase profiler for the one-shot dedup_components arms (r18): times the
  * signature pass, the banded pair pipeline, and the CC fixpoint
  * SEPARATELY for the routed (materialized-sh) and legacy (recompute-sh)
  * arms, printing partition counts and the physical join strategy of the
  * banded join — the evidence seam for attributing an arm-level
  * regression to a phase instead of re-running whole-query A/Bs.
  *
  * `sbt "runMain graft.RouteProf <sfDir> [rounds]"`
  */
object RouteProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/sf10")
    val rounds = args.drop(1).headOption.map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", 128)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def cpuNs(): Long =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime
        case _ => -1L
      }
    def timed[T](label: String)(f: => T): T = {
      System.gc()
      val t0 = System.nanoTime(); val c0 = cpuNs()
      val r = f
      println(f"""{"metric":"routeprof","phase":"$label","wall_sec":${(System.nanoTime() - t0) / 1e9}%.3f,"cpu_sec":${(cpuNs() - c0) / 1e9}%.3f}""")
      r
    }
    val docs = graft.sources.Tables.documents(spark, dir)
    println(s"""{"metric":"routeprof","phase":"scan_partitions","n":${docs.rdd.getNumPartitions}}""")
    for (r <- 1 to rounds) {
      // ---- routed arm, phase by phase ----
      val sh = timed("routed_sh_materialize") {
        val m = graft.operators.Dedup.simhash(docs)
          .transform(graft.operators.Materialize.once)
        println(s"""{"metric":"routeprof","phase":"sh_partitions","n":${m.rdd.getNumPartitions}}""")
        m
      }
      timed("routed_route_agg") {
        sh.agg(count(lit(1)), approx_count_distinct(col("simhash"))).head(): Unit
      }
      val pairs = graft.operators.Dedup.bandedTruePairs(sh, "routeprof")
        .select("d1", "d2")
      val joinNode = pairs.queryExecution.executedPlan.toString
        .linesIterator.filter(l => l.contains("Join") || l.contains("Exchange"))
        .take(6).mkString(" | ").replace("\"", "'")
      println(s"""{"metric":"routeprof","phase":"routed_pair_plan","nodes":"$joinNode"}""")
      val pairsM = timed("routed_pairs_materialize") {
        val m = pairs.transform(graft.operators.Materialize.once)
        println(s"""{"metric":"routeprof","phase":"routed_pairs_rows","n":${m.count()}}""")
        m
      }
      timed("routed_cc") {
        graft.operators.Dedup.connectedComponents(
          docs.select(col("doc_id").as("node")), pairsM).count(): Unit
      }
      graft.operators.Materialize.drop(pairsM)
      graft.operators.Materialize.drop(sh)
      // ---- legacy arm, phase by phase ----
      val lpairs = graft.operators.Dedup
        .bandedTruePairs(graft.operators.Dedup.simhash(docs), "routeprof")
        .select("d1", "d2")
      val ljoin = lpairs.queryExecution.executedPlan.toString
        .linesIterator.filter(l => l.contains("Join") || l.contains("Exchange"))
        .take(6).mkString(" | ").replace("\"", "'")
      println(s"""{"metric":"routeprof","phase":"legacy_pair_plan","nodes":"$ljoin"}""")
      val lpairsM = timed("legacy_pairs_materialize") {
        val m = lpairs.transform(graft.operators.Materialize.once)
        println(s"""{"metric":"routeprof","phase":"legacy_pairs_rows","n":${m.count()}}""")
        m
      }
      timed("legacy_cc") {
        graft.operators.Dedup.connectedComponents(
          docs.select(col("doc_id").as("node")), lpairsM).count(): Unit
      }
      graft.operators.Materialize.drop(lpairsM)
    }
    spark.stop()
  }
}
