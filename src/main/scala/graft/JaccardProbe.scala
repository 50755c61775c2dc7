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
  */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
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
}
