package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AnnIndexIO, Similarity}

/** Persisted IVF×PQ index: build-once / serve-many correctness, the
  * zero-corpus-pass serving plan, static partition pruning on the
  * cell-partitioned code table, and idempotent incremental append.
  */
class AnnIndexIOSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  private def key(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))

  test("served top-k from the on-disk index equals the in-memory ivfpq pipeline") {
    AnnIndexIO.deleteIndex(spark, sf)
    Similarity.clearAnnIndexCache()
    val expect = SparkEntry.queries("ann_ivfpq_topk")(spark, sf).collect().map(key).toSet
    // simulate a fresh serving JVM: in-memory train cache gone, index on disk
    Similarity.clearAnnIndexCache()
    val got = SparkEntry.queries("ann_ivfpq_served_topk")(spark, sf).collect().map(key).toSet
    assert(got == expect)
    // sf0.001 carries 10 of the 50 fixed query ids; 5 ranks each
    assert(got.size == 50)
  }

  test("serving plan touches the source table only for the O(K) query side") {
    val root = AnnIndexIO.ensureFullBuilt(spark, sf)
    val df = SparkEntry.queries("ann_ivfpq_served_topk")(spark, sf)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // corpus flows from the persisted code table, not the source parquet
    assert(plan.contains("codes.parquet"), plan)
    assert(plan.contains(root.stripPrefix("/")), plan)
    // every scan of the source table is the O(K) query side: each carries
    // the vec_id IN (…) pushdown (never a full corpus read)
    val scanBlocks = "(?s)Scan parquet.*?ReadSchema".r.findAllIn(plan).toList
    val embBlocks = scanBlocks.filter(_.contains("embeddings.parquet"))
    assert(embBlocks.nonEmpty, plan)
    assert(embBlocks.forall(_.contains("In(vec_id")), plan)
  }

  test("single-query routing statically prunes the code table to nprobe cells") {
    val root = AnnIndexIO.ensureFullBuilt(spark, sf)
    val q = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") === 0L)
      .select(col("embedding").cast("array<double>").as("emb"))
      .head().getSeq[Double](0).toArray
    val routed = AnnIndexIO.routeOne(spark, root, q, 2)
    val rows = routed.collect()
    assert(rows.length == 5)
    val scan = routed.queryExecution.executedPlan.collectFirst {
      case sc: FileSourceScanExec
        if sc.relation.location.rootPaths.exists(_.toString.contains("codes.parquet")) => sc
    }.get
    // 8 cells on disk; the literal IN filter leaves exactly 2 partitions
    val partitions = scan.relation.location.listFiles(
      scan.partitionFilters, scan.dataFilters)
    assert(partitions.length == 2,
      s"expected nprobe=2 pruned partitions, got ${partitions.length}")
    // routed results really live in the probed cells
    val (cents, _) = AnnIndexIO.readModel(spark, root)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val probed = cents.indices.sortBy(i => (-cos(q, cents(i)), -i)).take(2).toSet
    val cellOf = spark.read.parquet(s"$root/codes.parquet")
      .select("vec_id", "cell_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.forall(r => probed.contains(cellOf(r.getLong(0)))))
  }

  test("incremental append is idempotent and leaves base codes untouched") {
    AnnIndexIO.deleteIndex(spark, sf)
    val root = AnnIndexIO.ensureIncrBuilt(spark, sf)
    val fsys = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def codeFiles = {
      val it = fsys.listFiles(new org.apache.hadoop.fs.Path(root, "codes.parquet"), true)
      val b = Seq.newBuilder[(String, Long)]
      while (it.hasNext) {
        val st = it.next()
        if (st.getPath.getName.endsWith(".parquet"))
          b += ((st.getPath.toString, st.getModificationTime))
      }
      b.result().toSet
    }
    val after1 = codeFiles
    // a replayed build/append (the Ingest retry idiom) must be a no-op
    val root2 = AnnIndexIO.ensureIncrBuilt(spark, sf)
    assert(root2 == root)
    assert(codeFiles == after1, "replay must not rewrite or duplicate code files")

    val codes = spark.read.parquet(s"$root/codes.parquet")
    val total = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(codes.count() == total, "base + delta covers the whole corpus once")
    assert(codes.select("vec_id").distinct().count() == total)

    val res = SparkEntry.queries("ann_ivfpq_incremental")(spark, sf).collect()
    val nq = res.map(_.getLong(0)).distinct.length
    assert(nq == 10) // query ids present at sf0.001
    assert(res.length == nq * 5)
    assert(res.map(r => r.getLong(0) -> r.getInt(1)).distinct.length == res.length)
  }

  test("streamed ANN serving equals the batch answer (stream==batch)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = AnnIndexIO.ensureFullBuilt(spark, sf)
    // three corpus-member query vectors -> streamed answers must equal the
    // ann_ivfpq_topk rows for those query ids
    val qids = Seq(0L, 50L, 100L)
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[graft.streaming.AnnServe.AnnQuery]
    in.addData(qids.map(id => graft.streaming.AnnServe.AnnQuery(id, vecs(id))))
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long, Double)]
    val q = graft.streaming.AnnServe.serve(in.toDS(), root, (df, _) =>
      got ++= df.collect().map(key))
    try q.processAllAvailable() finally q.stop()
    val expect = SparkEntry.queries("ann_ivfpq_topk")(spark, sf)
      .filter(col("query_id").isin(qids: _*)).collect().map(key)
    assert(got.toSet == expect.toSet)
    assert(got.size == qids.size * 5)
  }

  test("stream-maintained index equals the batch incremental build") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    AnnIndexIO.deleteIndex(spark, sf)
    // batch reference: base build + delta appended in one batch
    val incrRoot = AnnIndexIO.ensureIncrBuilt(spark, sf)
    val expect = AnnIndexIO.serveAll(spark, sf, incrRoot).collect().map(key).toSet

    // stream variant: same base build, delta arrives as two micro-batches
    val streamRoot = AnnIndexIO.ensureBaseBuilt(spark, sf, "stream")
    val delta = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") % AnnIndexIO.DeltaMod === 0)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .collect()
      .map(r => graft.streaming.AnnServe.AnnInsert(r.getLong(0), r.getSeq[Double](1).toArray))
    val (d1, d2) = delta.partition(_.vec_id % 2 == 0)
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[graft.streaming.AnnServe.AnnInsert]
    val cp = java.nio.file.Files.createTempDirectory("ann_maintain_cp").toString
    in.addData(d1.toSeq)
    val q = graft.streaming.AnnServe.maintain(in.toDS(), streamRoot, cp)
    try {
      q.processAllAvailable()
      in.addData(d2.toSeq)
      q.processAllAvailable()
    } finally q.stop()

    // a replayed micro-batch id must rewrite its own dirs, not duplicate
    AnnIndexIO.appendBatch(spark, streamRoot, d2.toSeq.toDF("vec_id", "emb"), 1L)
    val codes = spark.read.parquet(s"$streamRoot/codes.parquet")
    val total = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(codes.count() == total)
    assert(codes.select("vec_id").distinct().count() == total)
    // base bulk build (batch_id=-1) + 2 streamed batches
    assert(codes.select(col("batch_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted.sameElements(Array(-1L, 0L, 1L)))

    val got = AnnIndexIO.serveAll(spark, sf, streamRoot).collect().map(key).toSet
    assert(got == expect)
  }

  test("compactCells folds streamed batch dirs without changing served answers") {
    import spark.implicits._
    AnnIndexIO.deleteIndex(spark, sf)
    val root = AnnIndexIO.ensureBaseBuilt(spark, sf, "stream")
    // 8 streamed micro-batches (delta split round-robin)
    val delta = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") % AnnIndexIO.DeltaMod === 0)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    (0 until 8).foreach { b =>
      val rows = delta.filter(_._1 % 8 == b).toSeq
      if (rows.nonEmpty)
        AnnIndexIO.appendBatch(spark, root, rows.toDF("vec_id", "emb"), b.toLong)
    }
    val before = AnnIndexIO.serveAll(spark, sf, root).collect().map(key).toSet
    def files = {
      val it = new java.io.File(s"$root/codes.parquet").listFiles()
      def rec(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(rec) else Seq(f)
      it.toSeq.flatMap(rec).filter(_.getName.endsWith(".parquet"))
    }
    val nBefore = files.size
    // the hottest streamed batch dir must survive compaction (replay stays
    // idempotent): capture which cells carry batch_id=7 BEFORE, compare after
    def cellsWithHotBatch = new java.io.File(s"$root/codes.parquet").listFiles()
      .filter(_.isDirectory)
      .filter(c => c.listFiles().exists(_.getName == "batch_id=7"))
      .map(_.getName).toSet
    val hotBefore = cellsWithHotBatch
    assert(hotBefore.nonEmpty, "fixture must stream rows into batch 7")
    val stats = AnnIndexIO.compactCells(spark, root)
    assert(stats.nonEmpty && stats.exists(_.dirsCompacted > 0))
    assert(files.size < nBefore, s"${files.size} !< $nBefore")
    assert(cellsWithHotBatch == hotBefore,
      s"hottest batch dirs changed: before=$hotBefore after=$cellsWithHotBatch")
    val after = AnnIndexIO.serveAll(spark, sf, root).collect().map(key).toSet
    assert(after == before, "compaction must not change served answers")
    val codes = spark.read.parquet(s"$root/codes.parquet")
    val total = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(codes.count() == total)
    assert(codes.select("vec_id").distinct().count() == total)
  }
}
