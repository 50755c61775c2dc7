package graft

import org.apache.spark.sql.SparkSession

/** Prefix-Jaccard plan-anatomy probe: one JVM, one corpus — times the
  * natural plan, then the forced-prefix pipeline's candidate stage and
  * full query with the PPJoin filters toggled. The row counts double as
  * candidate-volume counters (`stage=cand` returns the candidate set).
  * This probe is what falsified the r10 auto-select gate at r14: the
  * stale ratio routed every fixture to the direct join, hiding a 6.6×
  * sf10 win (AB_r14.json `jaccard_anatomy` rows).
  *
  * `SPARK_GRAFT_CPUS=16 sbt "runMain graft.JaccardProbe <dir>"`
  *
  * TRUTH-THRESHOLD mode (r17, VERDICT r16 #3):
  * `sbt "runMain graft.JaccardProbe --truth [nDocs]"` builds a
  * BOILERPLATE-HEAVY fixture — the high-shared-shingle-df regime the
  * dedup_eval_minhash truth threshold was tightened for (t 0.6 → 0.79,
  * measured ~flat on the ordinary fixture) — and measures candidate
  * volume + wall + cpu of the full prefix-truth run at BOTH thresholds,
  * interleaved in one JVM. Fixture shape: every doc = 80 shared
  * boilerplate tokens (≈76 shingles at df=N, the quadratic candidate
  * mass) + 22 unique tokens (≈24 shingles at df=1); n_sh = 100, so the
  * t=0.79 prefix (21 shingles) sits ENTIRELY inside the unique tail
  * while the t=0.6 prefix (40) admits ~16 boilerplate shingles — the
  * candidate-term separation the threshold argument predicts. A few
  * planted near-dup pairs keep the ≥ 0.8 truth output non-empty.
  */
object JaccardProbe {

  private def cpuNs(): Long =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime
      case _ => -1L
    }

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark
  }

  def main(args: Array[String]): Unit =
    if (args.headOption.contains("--truth")) truthProbe(args.drop(1))
    else anatomyProbe(args)

  private def anatomyProbe(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = session()
    def run(tag: String): Unit = {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries("dedup_ngram_jaccard_prefix")(spark, dir).count()
      println(f"""{"metric":"jaccard_probe","arm":"$tag","rows":$n,"wall_sec":${(System.nanoTime() - t0) / 1e9}%.1f}""")
    }
    run("natural_full")
    sys.props("graft.jaccard.prefix.ratio") = "-1" // force prefix
    sys.props("graft.jaccard.stage") = "cand"
    run("prefix_cand_ppjoin_on")
    sys.props("graft.jaccard.ppjoin") = "off"
    run("prefix_cand_ppjoin_off")
    sys.props.remove("graft.jaccard.stage")
    run("prefix_full_ppjoin_off")
    sys.props.remove("graft.jaccard.ppjoin")
    run("prefix_full_ppjoin_on")
    spark.stop()
  }

  private def truthProbe(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(2000)
    val spark = session()
    import spark.implicits._
    // deterministic token streams: boilerplate tokens shared verbatim by
    // every doc; unique tokens salted per doc (df = 1 by construction)
    val boiler = (0 until 80).map(j => s"boiler$j").mkString(" ")
    val docs = (0 until nDocs).map { i =>
      val unique = (0 until 22).map(j => s"u${i}x$j").mkString(" ")
      (i.toLong, s"$boiler $unique", "en", "crawl", 0L)
    } ++ (0 until 20).map { p => // planted near-dups: ≥ 0.8 truth survivors
      val i = nDocs + p
      val unique = (0 until 22).map(j => s"u${p}x$j").mkString(" ")
      (i.toLong, s"$boiler $unique", "en", "crawl", 0L)
    }
    val dir = java.nio.file.Files.createTempDirectory("jac_truth").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // interleave: cand-volume then full run, per threshold, twice — the
    // same-JVM A/B discipline (cold-start absorbed by round 1)
    def runOne(t: Double, stage: String): (Long, Double, Double) = {
      if (stage == "cand") sys.props("graft.jaccard.stage") = "cand"
      try {
        val t0 = System.nanoTime(); val c0 = cpuNs()
        val df = graft.operators.Dedup.jaccardPrefixPairs(spark, dir, t)
        val n =
          if (stage == "cand") df.count()
          else df.filter($"jaccard" >= 0.8).count()
        (n, (System.nanoTime() - t0) / 1e9,
          if (c0 < 0) -1.0 else (cpuNs() - c0) / 1e9)
      } finally sys.props.remove("graft.jaccard.stage")
    }
    for (round <- 1 to 2; t <- Seq(0.6, 0.79); stage <- Seq("cand", "truth")) {
      val (rows, wall, cpu) = runOne(t, stage)
      println(f"""{"metric":"jaccard_truth_probe","fixture":"boilerplate","n_docs":${nDocs + 20},"t":$t,"stage":"$stage","round":$round,"rows":$rows,"wall_sec":$wall%.2f,"cpu_sec":$cpu%.2f}""")
    }
    spark.stop()
  }
}
