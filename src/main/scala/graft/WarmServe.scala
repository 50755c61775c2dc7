package graft

import org.apache.spark.sql.SparkSession

/** Warm-restart harness for every persisted store (r19, VERDICT r18 #3):
  * the SemAssignStoreSpec teardown footgun silently invalidated the sf10
  * assignment store for a full round of "warm" captures, and the 58 s /
  * 419 cpu-s rebuilds it caused were only caught by a cpu anomaly — this
  * class of regression is SILENT because a store rebuild serves correct
  * rows, just at cold-build cost. The harness makes it loud:
  *
  *   1. `runMain graft.WarmServe build <sfDir>`  — runs every
  *      store-backed query once, building + publishing all stores;
  *   2. (fresh JVM) `runMain graft.WarmServe serve <sfDir> [out.json]` —
  *      serves the same queries and asserts the ColdBuilds trace
  *      contains ONLY load-class entries (zero trainer/assign/build/
  *      absorb/upgrade), emitting per-query serve wall/cpu as a JSON
  *      artifact (the SCALE10 warm-restart block, generated instead of
  *      hand-assembled) and exiting non-zero on any violation.
  *
  * A deliberately torn marker (or any other silent store invalidation)
  * surfaces as the rebuild tag it causes — WarmServeSpec tears one and
  * asserts the harness fails loudly.
  */
object WarmServe {

  /** The store-backed serve surface. Curated (names change rarely and a
    * typo must fail fast — [[main]] requires every name to resolve), with
    * a completeness guard in [[servedNames]]: any registered query whose
    * name says `_stored`/`_served` must be in this list, so a new store
    * query cannot silently dodge the harness.
    */
  private[graft] val Served: Seq[String] = Seq(
    "dedup_incremental_stored",
    "dedup_components_incremental",
    "dedup_components_stored",
    "split_assign_leakage_safe_stored",
    "corpus_train_manifest_stored",
    "dedup_semantic",
    "embedding_kmeans",
    "embedding_prototypicality",
    "ann_ivfpq_served_topk",
    "ann_ivfpq_incremental",
    "ann_recall_incremental",
    "text_bm25_served_topk",
    "text_bm25_incremental",
    "ann_hybrid_served_rrf",
    "ann_hybrid_served_rerank")

  private[graft] def servedNames(all: Set[String]): Seq[String] = {
    val missing = Served.filterNot(all)
    require(missing.isEmpty, s"WarmServe list names unknown queries: $missing")
    val dodged = all.filter(n => (n.contains("_stored") || n.contains("_served"))
      && !Served.contains(n))
    require(dodged.isEmpty,
      s"store-backed queries missing from WarmServe.Served: $dodged")
    Served
  }

  /** Load-class ColdBuilds tags — acceptable on a warm restart because
    * they read persisted/bounded state: explicit `_load`s, store metadata
    * reads, and per-JVM probes bounded by the query set or a parquet
    * footer (never a corpus pass or a trainer). Everything else on a
    * warm serve means a store was silently invalidated.
    */
  private val WarmOk = Set(
    "bm_meta", "bm_frozen_stats", "emb_count", "emb_dim",
    "jaccard_df_stats", "dsir_model")

  private[graft] def violations(tags: Seq[String]): Seq[String] =
    tags.filterNot { t =>
      val base = t.takeWhile(_ != ':')
      base.endsWith("_load") || WarmOk.contains(base)
    }

  private def processCpuNs(): Long =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime
      case _ => -1L
    }

  /** Serve each named query once, returning (wall s, cpu s, cold tags). */
  private[graft] def serveOnce(spark: SparkSession, sfDir: String,
      names: Seq[String]): Seq[(String, Double, Double, Seq[String])] = {
    val qs = SparkEntry.queries
    names.map { name =>
      val m = ColdBuilds.mark()
      val t0 = System.nanoTime()
      val c0 = processCpuNs()
      qs(name)(spark, sfDir).count(): Unit
      val wall = (System.nanoTime() - t0) / 1e9
      val cpu = if (c0 >= 0) (processCpuNs() - c0) / 1e9 else -1.0
      (name, wall, cpu, ColdBuilds.since(m))
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty && Set("build", "serve").contains(args(0)),
      "usage: WarmServe build|serve [sfDir] [outJson]")
    val mode = args(0)
    val sfDir = if (args.length > 1) args(1) else
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = if (args.length > 2) args(2) else "/tmp/graft_warmserve.json"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = servedNames(SparkEntry.queries.keySet)
    val rows = serveOnce(spark, sfDir, names)
    if (mode == "build") {
      val built = rows.flatMap(_._4)
      System.err.println(s"[warmserve] build phase cold builds: ${built.mkString(", ")}")
      println(s"""{"metric":"warmserve_build","queries":${names.size},"cold_builds":${built.size},"sf":"$sfDir"}""")
    } else {
      val bad = rows.map(r => r._1 -> violations(r._4)).filter(_._2.nonEmpty)
      val qJson = rows.map { case (n, w, c, tags) =>
        "\"" + n + "\":{\"wall\":" + f"$w%.3f" + ",\"cpu\":" + f"$c%.3f" +
          ",\"cold_builds\":" + tags.map("\"" + _ + "\"").mkString("[", ",", "]") + "}"
      }.mkString("{", ",", "}")
      val vJson = bad.map { case (n, v) =>
        "\"" + n + "\":" + v.map("\"" + _ + "\"").mkString("[", ",", "]")
      }.mkString("{", ",", "}")
      val gate = if (bad.isEmpty) "pass" else "fail"
      val line = s"""{"metric":"warmserve","gate":"$gate","queries":$qJson,"violations":$vJson,"sf":"$sfDir"}"""
      Bench.writeDetail("GRAFT_WARMSERVE_DETAIL", out, Seq(line)): Unit
      try spark.stop()
      catch { case e: Throwable => System.err.println(s"[warmserve] spark.stop failed: $e") }
      println(line)
      if (bad.nonEmpty) {
        System.err.println(s"[warmserve] FAIL — warm serve paid store builds: $bad")
        sys.exit(1)
      }
    }
  }
}
