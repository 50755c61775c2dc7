package graft

import org.apache.spark.sql.SparkSession

/** Wall + process-CPU + GC per run of one query, standalone (r20). */
object QProf {
  private def cpuNs(): Long =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime
      case _ => -1L
    }
  private def gcMs(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()
    val queries = SparkEntry.queries
    val tmx = java.lang.management.ManagementFactory.getThreadMXBean
    def threadCpu(): Map[Long, (String, Long)] =
      tmx.getAllThreadIds.flatMap { id =>
        val t = tmx.getThreadInfo(id)
        if (t == null) None
        else Some(id -> (t.getThreadName, math.max(0L, tmx.getThreadCpuTime(id))))
      }.toMap
    // mirror JobProf's name filtering (ADVICE r20): a mistyped query name
    // gets a stderr note instead of a raw NoSuchElementException mid-loop
    names.filterNot(queries.contains).foreach(n =>
      System.err.println(s"[qprof] unknown query '$n' — skipped"))
    for (n <- names.filter(queries.contains); r <- 1 to 4) {
      val tc0 = threadCpu()
      val t0 = System.nanoTime(); val c0 = cpuNs(); val g0 = gcMs()
      queries(n)(spark, sfDir).count()
      println(f"$n%-34s run$r wall=${(System.nanoTime() - t0) / 1e9}%6.3f " +
        f"cpu=${(cpuNs() - c0) / 1e9}%7.3f gc=${(gcMs() - g0) / 1e3}%6.3f")
      if (r == 4 && sys.env.contains("GRAFT_QPROF_THREADS")) {
        val tc1 = threadCpu()
        // aggregate deltas by thread-name prefix (strip digits)
        val agg = scala.collection.mutable.Map.empty[String, Double]
        tc1.foreach { case (id, (name, c1)) =>
          val c0t = tc0.get(id).map(_._2).getOrElse(0L)
          val key = name.replaceAll("[0-9]+", "#")
          agg(key) = agg.getOrElse(key, 0.0) + (c1 - c0t) / 1e9
        }
        agg.toSeq.sortBy(-_._2).take(12).foreach { case (k, v) =>
          if (v > 0.05) println(f"    $v%7.3f  $k")
        }
      }
    }
    spark.stop()
  }
}
