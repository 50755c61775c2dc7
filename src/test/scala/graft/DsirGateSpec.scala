package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dsir
import graft.streaming.DsirGate

/** The streaming DSIR gate must agree exactly with the batch resampler
  * over the same frozen snapshot: replaying the candidate pool as
  * arrivals, the admitted set must be EXACTLY the batch dsir_sample,
  * and every per-arrival score must be bit-identical to the batch
  * weights + Gumbel columns.
  */
// top-level for row-encoder codegen (see PercDocArrival)
case class DsirDocArrival(doc_id: Long, text: String)

class DsirGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("stream admission == batch gumbel-top-k over the frozen snapshot") {
    assume(TestSpark.fixturesPresent, TestSpark.fixturesHint)
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tgt = Dsir.TargetSources.toSet
    val arrivals = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "source").as[(Long, String, String)].collect()
      .filterNot(r => tgt(r._3))
      .map { case (id, t, _) => DsirDocArrival(id, t) }.toSeq
    assert(arrivals.nonEmpty)

    val frozen = DsirGate.frozen(spark, sf)
    val in = MemoryStream[DsirDocArrival]
    in.addData(arrivals)
    val q = DsirGate.score(in.toDF(), frozen)
      .writeStream.format("memory").queryName("dsir_gate")
      .outputMode("append").trigger(Trigger.Once())
      .option("checkpointLocation", Files.createTempDirectory("dsir_ck").toString)
      .start()
    q.awaitTermination()
    val got = spark.table("dsir_gate").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    assert(got.size === arrivals.size)

    // per-arrival scores bit-identical to the batch weights frame
    val wantW = Dsir.queries("dsir_weights")(spark, sf)
      .select("doc_id", "n_tokens", "sum_lam").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet === wantW.keySet)
    got.foreach { case (id, (n, sl, _, _)) =>
      assert((n, sl) === wantW(id), s"doc $id") }

    // admitted set == the batch sample exactly
    val sample = Dsir.queries("dsir_sample")(spark, sf)
      .select("doc_id", "score_q").as[(Long, Long)].collect().toMap
    val admitted = got.collect { case (id, (_, _, sq, true)) => id -> sq }.toMap
    assert(admitted === sample)
  }

  test("the gate is stateless: no state operator in the streaming plan") {
    assume(TestSpark.fixturesPresent, TestSpark.fixturesHint)
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val frozen = DsirGate.frozen(spark, sf)
    val in = MemoryStream[DsirDocArrival]
    in.addData(DsirDocArrival(999999L, "fast column table row"))
    val q = DsirGate.score(in.toDF(), frozen)
      .writeStream.format("memory").queryName("dsir_gate_plan")
      .outputMode("append").trigger(Trigger.Once())
      .option("checkpointLocation", Files.createTempDirectory("dsir_pl").toString)
      .start()
    q.awaitTermination()
    // non-vacuous: progress must exist, and no progress may carry state
    assert(q.recentProgress.nonEmpty)
    assert(q.recentProgress.forall(p =>
      p.stateOperators.forall(_.numRowsTotal == 0L)))
  }

  test("an under-full sample freezes to an admit-all-scored gate") {
    assume(TestSpark.fixturesPresent, TestSpark.fixturesHint)
    import spark.implicits._
    // a snapshot whose candidate pool is smaller than SampleK: the batch
    // sample is not capacity-limited (every candidate admitted), so the
    // frozen gate must admit every scored arrival — a k-th-row cut here
    // would reject arrivals a batch re-run with spare capacity would
    // have admitted (ADVICE r11)
    val dir = Files.createTempDirectory("dsir_uf").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(60)
      .withColumn("rn", org.apache.spark.sql.functions
        .row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(org.apache.spark.sql.functions.col("doc_id"))))
    // 40 target docs + 20 candidates (< SampleK = 100)
    docs.withColumn("source",
        org.apache.spark.sql.functions.when(
          org.apache.spark.sql.functions.col("rn") <= 40,
          org.apache.spark.sql.functions.lit(Dsir.TargetSources.head))
          .otherwise(org.apache.spark.sql.functions.lit("web")))
      .drop("rn")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    graft.operators.Dsir.clearModelCache()
    try {
      val frozen = DsirGate.frozen(spark, dir)
      assert(frozen.cut === Some((Long.MinValue, Long.MaxValue)))
      // the worst-scoring candidate itself must be admitted
      val worst = Dsir.queries("dsir_weights")(spark, dir)
        .orderBy("sum_lam").limit(1)
        .join(spark.read.parquet(s"$dir/documents.parquet"), "doc_id")
        .select("doc_id", "text").as[(Long, String)].head()
      val out = DsirGate.score(
        Seq(DsirDocArrival(worst._1, worst._2)).toDF(), frozen).collect()
      assert(out.length == 1 && out.head.getAs[Boolean]("accepted"))
    } finally graft.operators.Dsir.clearModelCache()
  }

  test("an empty candidate pool freezes to an admit-nothing gate") {
    assume(TestSpark.fixturesPresent, TestSpark.fixturesHint)
    import spark.implicits._
    // a snapshot whose documents are ALL target sources: no candidates,
    // empty sample -> cut None, and the gate must admit no arrival
    val dir = Files.createTempDirectory("dsir_tgt").toString
    spark.read.parquet(s"$sf/documents.parquet")
      .limit(50)
      .withColumn("source", org.apache.spark.sql.functions.lit(Dsir.TargetSources.head))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    graft.operators.Dsir.clearModelCache()
    try {
      val frozen = DsirGate.frozen(spark, dir)
      assert(frozen.cut.isEmpty)
      val out = DsirGate.score(
        Seq(DsirDocArrival(1L, "fast column table row")).toDF(), frozen)
        .collect()
      assert(out.length == 1 && !out.head.getAs[Boolean]("accepted"))
    } finally graft.operators.Dsir.clearModelCache()
  }
}
