package graft

import org.apache.spark.sql.SparkSession

/** Interleaved same-JVM A/B timer — the measurement discipline the scale
  * artifacts demand (host CPU inflates up to 1.5× across runs, so
  * cross-JVM comparisons confound; see SURVEY round-13 notes). Times ONE
  * query in alternating A/B/A/B order inside one session, where A runs
  * with a system property unset and B with it set — e.g. the PPJoin
  * candidate filters (`graft.jaccard.ppjoin=off`) or a serve-plan
  * override (`graft.bm.serve.plan=docvec`). Emits one JSON line per
  * timed run (wall + process CPU + result rows, which doubles as an
  * output-parity check between arms), then min/median per arm.
  *
  * `sbt "runMain graft.AbProbe <sfDir> <query> <propKey> <propValB> [rounds]"`
  */
object AbProbe {

  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: AbProbe <sfDir> <query> <propKey> <propValB> [rounds]")
    val Array(dir, query, propKey, propValB) = args.take(4)
    val rounds = args.drop(4).headOption.map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // same memory envelope as ScaleSmoke (VERDICT r13 #8): start AQE
      // wide so sf10-sized sorts fit the default heap, coalesce back for
      // small stages — keeps A/B runs comparable to the scale artifacts
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
    val q = SparkEntry.queries(query)
    val walls = scala.collection.mutable.Map("A" -> List.empty[Double],
      "B" -> List.empty[Double])
    val cpusSec = scala.collection.mutable.Map("A" -> List.empty[Double],
      "B" -> List.empty[Double])
    // warmup BOTH arms: parquet footers, codegen, and any ARM-SPECIFIC
    // one-time cost (a plan-B-only file read or codegen path) land OUTSIDE
    // the timed samples. Warming only arm A would let B's first timed
    // sample absorb B-only cold costs.
    q(spark, dir).count()
    sys.props(propKey) = propValB
    q(spark, dir).count()
    sys.props.remove(propKey)
    for (r <- 1 to rounds; arm <- Seq("A", "B")) {
      if (arm == "B") sys.props(propKey) = propValB
      else sys.props.remove(propKey)
      // outside the timer: sweep the previous run's dead localCheckpoint
      // blocks (the ScaleSmoke basket hygiene — repeated heavy runs in
      // one JVM otherwise accumulate blocks until a sort spike OOMs the
      // default heap) and level the GC state both arms start from
      System.gc()
      val t0 = System.nanoTime()
      val c0 = cpuNs()
      val rows = q(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      val cpu = (cpuNs() - c0) / 1e9
      walls(arm) = walls(arm) :+ wall
      cpusSec(arm) = cpusSec(arm) :+ cpu
      println(f"""{"metric":"ab_run","query":"$query","arm":"$arm","round":$r,"prop":"$propKey=${if (arm == "B") propValB else "<unset>"}","wall_sec":$wall%.3f,"cpu_sec":$cpu%.3f,"rows":$rows}""")
    }
    sys.props.remove(propKey)
    def med(xs: List[Double]) = { val s = xs.sorted; s(s.size / 2) }
    println(f"""{"metric":"ab_summary","query":"$query","prop":"$propKey=$propValB","a_wall_min":${walls("A").min}%.3f,"b_wall_min":${walls("B").min}%.3f,"a_cpu_med":${med(cpusSec("A"))}%.3f,"b_cpu_med":${med(cpusSec("B"))}%.3f}""")
    spark.stop()
  }
}
