package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew
import graft.sources.{Tables, Writers}

/** Skew utilities produce results identical to their naive forms; the
  * shard writer produces a prunable hive layout.
  */
class SkewWritersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("salted join == plain join on an extreme-skew key (3 distinct values)") {
    val li = Tables.lineitem(spark, sf)
    val dim = Tables.lineitem(spark, sf)
      .select("l_returnflag").distinct()
      .withColumn("flag_code", expr("ascii(l_returnflag)"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("l_returnflag", "flag_code").count()
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val plain = canon(li.join(dim, Seq("l_returnflag")))
    val salted = canon(Skew.saltedJoin(li, dim, Seq("l_returnflag"), 8))
    assert(salted == plain && plain.nonEmpty)
  }

  test("two-stage distinct count == countDistinct") {
    val li = Tables.lineitem(spark, sf)
    val naive = li.groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("n_distinct"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val staged = Skew.twoStageDistinctCount(li, "l_returnflag", "l_partkey")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(staged == naive && naive.nonEmpty)
  }

  test("shard writer: hive layout, pruned read matches, shard size capped") {
    val out = Files.createTempDirectory("shards").toString
    val orders = Tables.orders(spark, sf)
    Writers.writeShards(orders, out, Seq("o_orderpriority"),
      Seq("o_orderdate"), maxRecordsPerFile = 200L)
    val back = spark.read.parquet(out)
    assert(back.count() == orders.count())
    // partition pruning: a filter on the partition col reads one directory
    val one = back.filter(col("o_orderpriority") === "1-URGENT")
    assert(one.count() ==
      orders.filter(col("o_orderpriority") === "1-URGENT").count())
    val files = new java.io.File(out).listFiles().filter(_.isDirectory)
    assert(files.nonEmpty && files.forall(_.getName.startsWith("o_orderpriority=")))
  }

  // The reference ships flink-connector-jdbc + postgresql jars (latent,
  // never wired). No DB server exists in this environment, so the spec
  // drives the sink against embedded Derby (on Spark's own classpath).
  private val jdbcUrl = "jdbc:derby:memory:graftjdbc;create=true"
  private def jdbcProps = {
    val p = new java.util.Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  test("jdbc sink: batch write + read-back round trip (embedded Derby)") {
    val scored = graft.operators.FraudRules
      .scoreTransactions(graft.gen.TxGen.dataset(spark, 300).toDF())
      .select(col("event_id"), col("card_id"), col("amount"), col("score"))
    Writers.writeJdbc(scored, jdbcUrl, "scored_batch", jdbcProps,
      numPartitions = 2)
    val back = spark.read.jdbc(jdbcUrl, "scored_batch", jdbcProps)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1),
        r.getDouble(2), r.getInt(3))).toSet
    assert(canon(back) == canon(scored) && back.count() == 300)
  }

  test("jdbc sink: streaming foreachBatch append (embedded Derby)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(String, Double)]
    in.addData(("e1", 10.0), ("e2", 250.0), ("e3", 42.5))
    val ckpt = Files.createTempDirectory("jdbc_ckpt").toString
    val q = Writers.streamToJdbc(
      in.toDS().toDF("event_id", "amount"),
      jdbcUrl, "scored_stream", ckpt, jdbcProps, numPartitions = 1)
    q.processAllAvailable()
    q.stop()
    val back = spark.read.jdbc(jdbcUrl, "scored_stream", jdbcProps)
    assert(back.collect().map(r => (r.getString(0), r.getDouble(1))).toSet ==
      Set(("e1", 10.0), ("e2", 250.0), ("e3", 42.5)))
  }
}
