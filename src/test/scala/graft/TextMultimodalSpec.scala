package graft

import org.apache.spark.sql.functions.{col, md5}
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.RollingHash
import graft.operators.Multimodal

/** Custom-expression and multimodal-pipeline semantics. */
class TextMultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("rolling_hash codegen expression matches the reference recurrence") {
    import spark.implicits._
    RollingHash.register(spark)
    def ref(s: String): Long =
      s.foldLeft(0L)((h, c) => (h * 31 + c) % 1000000007L)
    val inputs = Seq("hello world", "", "a", "the quick brown fox", "ünïcödé")
    val got = spark.createDataset(inputs).toDF("s")
      .selectExpr("s", "rolling_hash(s) as h")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    inputs.foreach(s => assert(got(s) == ref(s), s"mismatch for '$s'"))
    assert(got("hello world") == 204910434L) // pinned cross-engine value
  }

  test("quality scores are bounded and deterministic") {
    val df = graft.operators.TextOps.queries("text_quality")(spark, sf)
    val scores = df.select("quality_score").collect().map(_.getDouble(0))
    assert(scores.nonEmpty && scores.forall(s => s >= 0.0 && s <= 1.0001))
  }

  test("lang-id predicts en for stopword-bearing english word-salad") {
    val df = graft.operators.TextOps.queries("text_lang_id")(spark, sf)
    val preds = df.select("pred_lang").collect().map(_.getString(0))
    assert(preds.forall(_ == "en")) // corpus vocabulary only contains en stopwords
  }

  test("multimodal pipeline: schema, batch decode, determinism") {
    val feats = Multimodal.extractFeatures(Multimodal.synthesize(spark, sf))
    val rows = feats.collect()
    assert(rows.length == 500)
    rows.foreach { f =>
      assert(f.feature.length == Multimodal.FakeCodec.FeatureDim)
      assert(f.feature_norm > 0.0)
      assert(Set("image", "audio", "video").contains(f.kind))
      assert(f.n_bytes > 0)
    }
    // deterministic across plans
    val again = Multimodal.extractFeatures(Multimodal.synthesize(spark, sf))
      .collect().map(f => f.media_id -> f.feature_norm).toMap
    rows.foreach(f => assert(again(f.media_id) == f.feature_norm))
  }

  test("binary content column survives the opaque-payload roundtrip") {
    val blobs = Multimodal.synthesize(spark, sf)
    assert(blobs.schema("content").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    blobs.collect().take(20).foreach { b =>
      assert(new String(b.content, "UTF-8") == docs(b.media_id))
    }
  }

  test("training pipeline: quality gate + dedup funnel materializes clean shards") {
    import graft.operators.TrainingPipeline
    val out = Files.createTempDirectory("shards_pipeline").toString
    val minQ = 0.5
    val summary = TrainingPipeline.materialize(spark, sf, out, minQ)
      .collect().head
    val total = summary.getAs[Long]("total_docs")
    val kept = summary.getAs[Long]("kept")
    assert(total > 0 && kept > 0 && kept < total)

    val shards = spark.read.parquet(out)
    assert(shards.count() == kept)
    // no exact duplicates survive
    assert(shards.select(md5(col("text"))).distinct().count() == kept)
    // every kept doc clears the quality gate (score rides along in shards)
    assert(shards.filter(col("quality_score") < minQ).count() == 0)
    // near-dup clusters collapse to one survivor: no two kept docs share a
    // dedup_components cluster
    val clusters = graft.operators.Dedup.queries("dedup_components")(spark, sf)
      .select(col("doc_id"), col("cluster_id"))
    assert(shards.join(clusters, "doc_id")
      .groupBy("cluster_id").count().filter(col("count") > 1).count() == 0)
    // lang-partitioned layout
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
    assert(dirs.nonEmpty && dirs.forall(_.getName.startsWith("lang=")))

    // the STORED-LABEL variant (the nightly shard job's shape, r15)
    // materializes the identical funnel — the store's labels ARE the
    // clustering
    val out2 = Files.createTempDirectory("shards_stored").toString
    val summary2 = TrainingPipeline
      .materialize(spark, sf, out2, minQ, storedLabels = true)
      .collect().head
    assert(summary2 == summary)
    val shards2 = spark.read.parquet(out2)
    assert(shards2.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      shards.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("multimodal_dedup groups identical payloads and keeps min-id canonical") {
    val spark2 = spark
    import spark2.implicits._
    // the sf corpora carry near-dups but no exact payload dups — plant
    // them: docs 1/4 and 2/5 share bytes, 3 is unique
    val docs = Seq(
      (1L, "identical payload bytes one", "en", "t", 0L),
      (2L, "identical payload bytes two", "en", "t", 0L),
      (3L, "a unique payload", "en", "t", 0L),
      (4L, "identical payload bytes one", "en", "t", 0L),
      (5L, "identical payload bytes two", "en", "t", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("mmdedup").toString
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Multimodal.queries("multimodal_dedup")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getBoolean(4)))).toMap
    assert(out(1L) == ((2L, true)) && out(4L) == ((2L, false)))
    assert(out(2L) == ((2L, true)) && out(5L) == ((2L, false)))
    assert(out(3L) == ((1L, true)))
  }
}
