package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.gen.TxGen
import graft.ml.FraudModel

final case class FeatRow(event_id: String, f_amount: Double,
    f_recent_count: Double, f_gap_ms: Double, f_travel_km: Double)

/** MLlib fraud model: learns the injected fraud signal well above chance,
  * and the fitted model scores a streaming frame identically to batch.
  */
class FraudModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("model separates fraud intent from NORMAL (AUC > 0.8)") {
    import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
    val feats = FraudModel.featurize(TxGen.dataset(spark, 4000).toDF())
    val model = FraudModel.train(feats)
    val scored = FraudModel.score(model, feats)
    val auc = new BinaryClassificationEvaluator()
      .setRawPredictionCol("rawPrediction").setLabelCol("label")
      .evaluate(scored)
    assert(auc > 0.8, s"AUC=$auc")
  }

  test("summary query shape is stable: one row per event_type") {
    val sum = FraudModel.trainScoreSummary(TxGen.dataset(spark, 3000).toDF())
      .collect().map(r => r.getString(0)).sorted
    assert(sum.toSeq == Seq("CARD_TESTING", "IMPOSSIBLE_TRAVEL", "NORMAL", "VELOCITY"))
  }

  test("summary rows carry the in-query AUC self-check (r14: no_oracle row self-grades)") {
    val rows = FraudModel.trainScoreSummary(TxGen.dataset(spark, 4000).toDF())
      .select("auc_vs_intent").collect().map(_.getDouble(0)).distinct
    // one AUC for the whole summary, attached to every row, above the
    // asserted floor (the assert_true in the plan would have thrown on a
    // violation before this collect returned)
    assert(rows.length === 1)
    assert(rows.head >= FraudModel.MinSelfCheckAuc, s"AUC=${rows.head}")
  }

  test("q_approx_distinct self-grades: HLL estimate within the published envelope of the in-query exact count") {
    assume(TestSpark.fixturesPresent, TestSpark.fixturesHint)
    val r = graft.operators.Similarity.queries("q_approx_distinct")(
      spark, TestSpark.sf0001).collect()
    assert(r.length === 1)
    val row = r.head
    // the assert_true in the plan already enforced the 0.15 bound; pin
    // the emitted rel_err columns as real numbers under it
    val reParts = row.getAs[Double]("rel_err_parts")
    val reSupps = row.getAs[Double]("rel_err_supps")
    assert(reParts >= 0.0 && reParts <= 0.15)
    assert(reSupps >= 0.0 && reSupps <= 0.15)
  }

  test("fitted model scores a stream == batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val feats = FraudModel.featurize(TxGen.dataset(spark, 2000).toDF())
    val model = FraudModel.train(feats)
    // Featurized rows (windows are a batch step; streaming featurization
    // would use the stateful detector) → the model itself is stream-safe.
    val rows = feats.select("event_id", "f_amount", "f_recent_count", "f_gap_ms", "f_travel_km")
      .collect().map(r => FeatRow(r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    val ms = MemoryStream[FeatRow]
    ms.addData(rows)
    val q = FraudModel.score(model, ms.toDF())
      .select("event_id", "prediction")
      .writeStream.format("memory").queryName("ml_stream")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.Once())
      .option("checkpointLocation", Files.createTempDirectory("ml").toString)
      .start()
    q.awaitTermination(120000); q.stop()
    val streamed = spark.table("ml_stream").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    val batch = FraudModel.score(model,
      spark.createDataset(rows).toDF())
      .select("event_id", "prediction").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(streamed.nonEmpty && streamed == batch)
  }
}
