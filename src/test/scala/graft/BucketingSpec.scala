package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins via bucketing — the 100 TB join strategy: both fact
  * tables bucketed on the join key join WITHOUT any shuffle exchange.
  * Verified by inspecting the executed plan.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed-by-join-key tables sort-merge join with zero exchanges") {
    // default warehouse dir (./spark-warehouse, gitignored) — the conf is
    // static and cannot be set on a live session
    val li = spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
    val ord = spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    ord.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_bucketed")

    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(org.apache.spark.sql.functions.sum("l_quantity").as("qty"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must be shuffle-free; only the final aggregation
      // exchanges (on o_orderpriority)
      val joinSection = plan.split("HashAggregate").last
      assert(joinSection.contains("SortMergeJoin"), s"plan:\n$plan")
      assert(!joinSection.contains("Exchange"),
        s"join should consume bucketed layout without shuffling:\n$plan")
      // sanity: result matches the unbucketed join
      val expect = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(org.apache.spark.sql.functions.sum("l_quantity").as("qty"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("q_bucketed_join: the registered query's join is exchange-free") {
    val sf = TestSpark.sf0001
    val df = SparkEntry.queries("q_bucketed_join")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val joinSection = plan.split("HashAggregate").last
    assert(joinSection.contains("SortMergeJoin"), s"plan:\n$plan")
    assert(!joinSection.contains("Exchange"),
      s"bucketed layout must make the join shuffle-free:\n$plan")
    // and it agrees with the plain unbucketed formulation
    val expect = spark.read.parquet(s"$sf/orders.parquet")
      .join(spark.read.parquet(s"$sf/lineitem.parquet"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.round(
          org.apache.spark.sql.functions.sum(col("l_extendedprice")), 2).as("revenue"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expect)
  }
}
