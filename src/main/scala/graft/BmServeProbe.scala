package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.SparkSession

/** Focused attribution probe for the whole-document BM25 serving row
  * (StreamBench `bm25_serve_queries_per_sec`): interleaves the AUTO
  * plan-select arm against a forced-docvec arm in ONE JVM, printing
  * wall / process-cpu / θ-probe count per timed pass. Separates "the
  * verdict probe costs N" from "the persisted docvec serve itself got
  * slower" — the two candidate explanations whenever that row moves.
  *
  * `sbt "runMain graft.BmServeProbe [sfDir] [rounds]"`
  */
object BmServeProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val rounds = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def cpuNs(): Long =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime
        case _ => -1L
      }

    val root = graft.operators.BmStore.ensureFullBuilt(spark, sfDir)
    val qdocs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").limit(500).collect()
      .map(r => graft.streaming.BmServe.BmQuery(r.getLong(0), r.getString(1)))
      .toSeq

    def runServe(rows: Seq[graft.streaming.BmServe.BmQuery],
        batchSize: Int): Double = {
      val in = MemoryStream[graft.streaming.BmServe.BmQuery]
      rows.grouped(batchSize).foreach(b => in.addData(b))
      val t0 = System.nanoTime()
      val q = graft.streaming.BmServe.serve(in.toDS(), root,
        (df, _) => { df.select("query_id").distinct().count(); () },
        trigger = Trigger.AvailableNow())
      try { q.processAllAvailable(); (System.nanoTime() - t0) / 1e9 }
      finally q.stop()
    }

    runServe(qdocs.take(100), 50) // warmup: codegen, footers, verdict cache
    for (r <- 1 to rounds; arm <- Seq("auto", "docvec")) {
      if (arm == "docvec") sys.props("graft.bm.serve.plan") = "docvec"
      else sys.props.remove("graft.bm.serve.plan")
      val p0 = graft.operators.BmStore.wandProbeCount.get()
      val c0 = cpuNs()
      val wall = runServe(qdocs, 100)
      val cpu = (cpuNs() - c0) / 1e9
      val probes = graft.operators.BmStore.wandProbeCount.get() - p0
      println(f"""{"metric":"bmserve_ab","arm":"$arm","round":$r,"wall_sec":$wall%.3f,"cpu_sec":$cpu%.3f,"probes_in_timer":$probes,"qps":${500 / wall}%.0f}""")
    }
    sys.props.remove("graft.bm.serve.plan")
    spark.stop()
  }
}
