package graft

import org.apache.spark.sql.SparkSession

/** Micro-probe: fixed per-task cost at local[32] (r20). Times an N-task
  * no-op stage and an N-task md5 stage over the SAME tiny input for
  * several N, reporting wall and process-CPU per run — separates "the
  * spread tasks each burn ~100 ms of real overhead" from "executorRunTime
  * accounting includes idle/GC time".
  */
object TaskCost {
  private def cpuNs(): Long =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime
      case _ => -1L
    }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // warm
    for (n <- Seq(1, 4, 8, 16, 32); heavy <- Seq(false, true); pass <- 1 to 3) {
      val base = if (n == 1) docs else docs.repartition(n)
      val df = if (heavy)
        base.selectExpr("doc_id",
          "cast(conv(substring(md5(text), 1, 8), 16, 10) as bigint) h")
      else base.selectExpr("doc_id")
      val t0 = System.nanoTime(); val c0 = cpuNs()
      df.write.format("noop").mode("overwrite").save()
      val w = (System.nanoTime() - t0) / 1e9
      val c = (cpuNs() - c0) / 1e9
      if (pass == 3)
        println(f"n=$n%2d heavy=$heavy%5s wall=$w%6.3f cpu=$c%7.3f cpu/task=${c / n}%6.3f")
    }
    spark.stop()
  }
}
