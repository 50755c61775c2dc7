package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.SemanticDedup

/** The streaming semantic dedup must agree exactly with its batch twin —
  * the house-style stream ≡ batch equivalence proof, mirroring
  * [[StreamDedupSpec]]. The fixture embeddings are random (max pairwise
  * cosine ≈ 0.5), so the spec PLANTS near-dups: 100 vectors re-enter the
  * corpus with tiny deterministic noise (cosine ≈ 1 ≥ ε against their
  * originals), the detectable ground truth both sides must find.
  */
class SemanticDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  /** sf0.001 embeddings + 100 planted near-identical replicas
    * (vec_id + 1000, ± ~1e-4 per component), written once per JVM.
    */
  private lazy val plantedDir: String = {
    val dir = Files.createTempDirectory("semdup").toString
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
    val planted = base.filter(col("vec_id") < 100)
      .select((col("vec_id") + 1000).as("vec_id"),
        expr("""transform(embedding, (x, i) ->
          |  cast(x + (pmod(xxhash64(vec_id * 64 + i), 21) - 10) / 100000.0 as float))"""
          .stripMargin).as("embedding"),
        col("label"))
    base.unionByName(planted)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def arrivals(): Seq[SemanticDedup.VecArrival] =
    spark.read.parquet(s"$plantedDir/embeddings.parquet").collect()
      .map(r => SemanticDedup.VecArrival(r.getLong(0),
        // float→double widening, the exact batch-reader cast
        r.getSeq[Float](1).map(_.toDouble),
        1700000000000L + r.getLong(0))) // all within the horizon
      .toSeq

  test("streaming semantic dup pairs == batch is_dup pair set on planted near-dups") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[SemanticDedup.VecArrival]
    in.addData(arrivals())
    val q = SemanticDedup.dupPairs(in.toDS(),
        SemanticDedup.centroidsFor(spark, plantedDir), withinMs = 3600000L)
      .writeStream.format("memory").queryName("semdup")
      .outputMode("append").trigger(Trigger.Once())
      .option("checkpointLocation", Files.createTempDirectory("semdup_ck").toString)
      .start()
    q.awaitTermination()
    val got = spark.table("semdup").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val exp = graft.operators.Similarity.semanticDupPairs(spark, plantedDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    // ground truth is real: ~100 planted pairs, nothing vacuous
    assert(exp.size >= 90, s"expected ~100 planted pairs, got ${exp.size}")
    assert(got == exp, s"stream-only=${got -- exp}, batch-only=${exp -- got}")
  }

  test("dedup horizon: an arrival beyond withinMs of its twin is not paired") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val emb = Seq.fill(64)(0.1)
    val in = MemoryStream[SemanticDedup.VecArrival]
    in.addData(
      SemanticDedup.VecArrival(1L, emb, 0L),
      SemanticDedup.VecArrival(2L, emb, 5000L),     // within horizon of #1
      SemanticDedup.VecArrival(3L, emb, 10000000L)) // far beyond horizon
    // any single centroid assigns all three to one cluster
    val cents = Array(Array.fill(64)(0.05))
    val q = SemanticDedup.dupPairs(in.toDS(), cents, withinMs = 60000L)
      .writeStream.format("memory").queryName("semdup_h")
      .outputMode("append").trigger(Trigger.Once())
      .option("checkpointLocation", Files.createTempDirectory("semdup_h").toString)
      .start()
    q.awaitTermination()
    val got = spark.table("semdup_h").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L)))
  }
}
