package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.gen.TxGen
import graft.model.FraudConstants
import graft.streaming.FraudStreamTws

/** transformWithState (Spark 4 arbitrary-state API, RocksDB-backed)
  * produces the same scores as the flatMapGroupsWithState path and the
  * batch window formulation.
  */
class TwsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("transformWithState detector == batch window scores on the generator corpus") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val txs = TxGen.generate(1500)
      val ms = MemoryStream[graft.model.Transaction]
      ms.addData(txs)
      val q = FraudStreamTws.score(ms.toDS(), FraudConstants.RapidTxCountV1)
        .writeStream.format("memory").queryName("tws_scored")
        .outputMode("append")
        .trigger(Trigger.Once())
        .option("checkpointLocation", Files.createTempDirectory("tws").toString)
        .start()
      q.awaitTermination(180000); q.stop()
      val tws = spark.table("tws_scored")
        .select("event_id", "score").collect()
        .map(r => r.getString(0) -> r.getInt(1)).toMap
      val batch = graft.operators.FraudRules
        .scoreTransactions(spark.createDataset(txs).toDF())
        .select("event_id", "score").collect()
        .map(r => r.getString(0) -> r.getInt(1)).toMap
      assert(tws.size == 1500)
      val diffs = batch.collect { case (id, s) if tws(id) != s => (id, s, tws(id)) }
      assert(diffs.isEmpty, s"first diffs: ${diffs.take(5)}")
    } finally {
      if (prev.nonEmpty)
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
      else spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
