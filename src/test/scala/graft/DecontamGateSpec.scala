package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{TrainingPipeline, Winnow}
import graft.streaming.DecontamGate

/** The streaming decontamination gate must agree exactly with the batch
  * sweeps over the same frozen eval snapshot: replaying the train-side
  * corpus as arrivals, the word-level channel must reproduce
  * decontam_overlap's (n_shared, contaminated) rows and the char-level
  * channel decontam_winnow's, row for row; the bloom tier must be a
  * pure short-circuit (no false negatives observable as
  * n_bloom < n_shingle_hits); and the gate must be stateless.
  */
// top-level for row-encoder codegen (see DsirDocArrival)
case class DecontamDocArrival(doc_id: Long, text: String)

class DecontamGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  private lazy val frozen = DecontamGate.frozen(spark, sf)

  private lazy val streamed: Map[Long, (Int, Long, Boolean, Long, Boolean)] = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val arrivals = spark.read.parquet(s"$sf/documents.parquet")
      .filter(org.apache.spark.sql.functions.col("doc_id") % 20 =!= 0)
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => DecontamDocArrival(id, t) }.toSeq
    assert(arrivals.nonEmpty)
    val in = MemoryStream[DecontamDocArrival]
    in.addData(arrivals)
    val q = DecontamGate.score(in.toDF(), frozen)
      .writeStream.format("memory").queryName("decontam_gate")
      .outputMode("append").trigger(Trigger.Once())
      .option("checkpointLocation", Files.createTempDirectory("dcg_ck").toString)
      .start()
    q.awaitTermination()
    val rows = spark.table("decontam_gate").collect()
      .map(r => r.getLong(0) ->
        // hit counts are LONG (ADVICE r12): the gate's schema matches the
        // batch twins' BIGINT n_shared/n_hits, asserted by the getLong
        ((r.getInt(1), r.getLong(2), r.getBoolean(3), r.getLong(4), r.getBoolean(5))))
      .toMap
    assert(rows.size === arrivals.size)
    rows
  }

  test("word channel == batch decontam_overlap, row for row") {
    assume(TestSpark.fixturesPresent, TestSpark.fixturesHint)
    import spark.implicits._
    val want = TrainingPipeline.queries("decontam_overlap")(spark, sf)
      .select("doc_id", "n_shared", "contaminated")
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(streamed.keySet === want.keySet)
    streamed.foreach { case (id, (_, nSh, cont, _, _)) =>
      assert((nSh, cont) === want(id), s"doc $id")
    }
    // non-vacuous: the fixture plants real contamination
    assert(want.values.exists(_._2))
  }

  test("char channel == batch decontam_winnow, row for row") {
    assume(TestSpark.fixturesPresent, TestSpark.fixturesHint)
    import spark.implicits._
    val want = Winnow.queries("decontam_winnow")(spark, sf)
      .select("doc_id", "n_shared", "contaminated")
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(streamed.keySet === want.keySet)
    streamed.foreach { case (id, (_, _, _, nW, cont)) =>
      assert((nW, cont) === want(id), s"doc $id")
    }
  }

  test("the bloom tier is a pure short-circuit: n_bloom >= exact hits") {
    assume(TestSpark.fixturesPresent, TestSpark.fixturesHint)
    streamed.foreach { case (id, (nBloom, nSh, _, _, _)) =>
      assert(nBloom >= nSh, s"doc $id: bloom false negative")
    }
    // the fpp tail is allowed but bounded in practice; at fixture scale
    // the 2^21-bit filter over a few thousand keys should be near-exact
    val tail = streamed.values.count { case (nb, ns, _, _, _) => nb > ns }
    assert(tail <= streamed.size / 20, s"fpp tail implausibly large: $tail")
  }

  test("the gate is stateless: no state operator in the streaming plan") {
    assume(TestSpark.fixturesPresent, TestSpark.fixturesHint)
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[DecontamDocArrival]
    in.addData(DecontamDocArrival(999999L, "fast column table row"))
    val q = DecontamGate.score(in.toDF(), frozen)
      .writeStream.format("memory").queryName("decontam_gate_plan")
      .outputMode("append").trigger(Trigger.Once())
      .option("checkpointLocation", Files.createTempDirectory("dcg_pl").toString)
      .start()
    q.awaitTermination()
    assert(q.recentProgress.nonEmpty)
    assert(q.recentProgress.forall(p =>
      p.stateOperators.forall(_.numRowsTotal == 0L)))
  }
}
