package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Signature-collapse probe (r18, VERDICT r17 #1): prints, per dataset
  * dir, the corpus size, the exact and approximate distinct 48-bit
  * simhash counts, and the collapse factor n / n_sig the contraction
  * router keys on — the evidence row behind the
  * [[operators.Dedup.CcSigDedupMinCollapse]] threshold. The approx
  * column is the ROUTER'S estimator (approx_count_distinct, one
  * map-side HLL pass — the 100 TB-safe plan); the exact column is
  * printed beside it so a reader can see the estimator's error on the
  * same line. `sbt "runMain graft.SigCollapseProbe dir1 [dir2 ...]"`.
  */
object SigCollapseProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    dirs.foreach { d =>
      val sh = spark.read.parquet(s"$d/documents.parquet")
        .select(expr("simhash48(text)").as("simhash"))
      val row = sh.agg(count(lit(1)).as("n"),
        countDistinct(col("simhash")).as("n_sig"),
        approx_count_distinct(col("simhash")).as("n_sig_approx")).head()
      val (n, nSig, nApprox) = (row.getLong(0), row.getLong(1), row.getLong(2))
      val c = if (nSig == 0) 1.0 else n.toDouble / nSig
      val ca = if (nApprox == 0) 1.0 else n.toDouble / nApprox
      println(f"""{"metric":"sig_collapse","dir":"$d","n":$n,"n_sig":$nSig,"n_sig_approx":$nApprox,"collapse":$c%.4f,"collapse_approx":$ca%.4f}""")
    }
    spark.stop()
  }
}
