package graft

import org.apache.spark.sql.functions.{col, countDistinct, expr}
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the custom KMV TypedImperativeAggregate: exact below k,
  * bounded-error estimation above k, and — the property that makes it
  * oracle-expressible where HLL isn't — invariance to partitioning and
  * merge order.
  */
class KmvSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def kmv(values: Seq[String], parts: Int): Long = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    values.toDF("v").repartition(parts)
      .agg(expr("kmv_distinct(v)").as("est"))
      .collect()(0).getLong(0)
  }

  test("exact path below k: counts distincts, ignores duplicates and partitioning") {
    val vals = (1 to 100).map(i => s"val-$i")
    val withDups = vals ++ vals ++ vals.take(37)
    assert(kmv(withDups, 1) == 100L)
    assert(kmv(withDups, 13) == 100L)
  }

  test("estimate path above k: partition-invariant and within KMV error bounds") {
    val vals = (1 to 5000).flatMap(i => Seq(s"doc-$i", s"doc-$i")) // 10k rows, 5k distinct
    val e1 = kmv(vals, 1)
    val e8 = kmv(vals, 8)
    val e64 = kmv(vals, 64)
    // merge order must not matter — this is what lets DuckDB's global
    // ORDER BY hash LIMIT k reproduce a distributed aggregation exactly
    assert(e1 == e8 && e8 == e64, s"partitioning changed the sketch: $e1 $e8 $e64")
    // k=256 → relative standard error ~1/sqrt(k) ≈ 6.3%; allow 4 sigma
    assert(math.abs(e1 - 5000.0) / 5000.0 < 0.25, s"estimate $e1 too far from 5000")
  }

  test("nulls are ignored") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val est = Seq(Some("a"), None, Some("b"), None, Some("a"))
      .toDF("v").agg(expr("kmv_distinct(v)")).collect()(0).getLong(0)
    assert(est == 2L)
  }

  test("matches exact on the bench column (sanity vs countDistinct)") {
    graft.functions.GraftFunctions.register(spark)
    val row = graft.sources.Tables.lineitem(spark, TestSpark.sf0001)
      .agg(expr("kmv_distinct(cast(l_suppkey as string))").as("approx"),
        countDistinct(col("l_suppkey")).as("exact"))
      .collect()(0)
    // suppkey cardinality is far below k=256 → exact path
    assert(row.getLong(0) == row.getLong(1))
  }

  test("q_approx_quantile_kmv: sample quantiles track the exact distribution") {
    val sf = TestSpark.sf0001
    val row = SparkEntry.queries("q_approx_quantile_kmv")(spark, sf).collect()(0)
    assert(row.getLong(4) == graft.operators.SamplingOps.QuantileK) // n_sample
    val exact = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_extendedprice")).collect().map(_.getDouble(0)).sorted
    // rank-space error: the empirical CDF at each approximate quantile
    // must sit near its nominal p (sqrt(p(1-p)/k) ~ 3 % at the median;
    // bounds are ~4 sigma — the sample is deterministic, never flaky)
    def cdf(v: Double) = exact.count(_ <= v).toDouble / exact.length
    for (((p, _), i) <- Seq(0.1 -> "p10", 0.5 -> "p50", 0.9 -> "p90", 0.99 -> "p99").zipWithIndex) {
      val approx = row.getDouble(i)
      val err = math.abs(cdf(approx) - p)
      val tol = 4 * math.sqrt(p * (1 - p) / graft.operators.SamplingOps.QuantileK) + 0.01
      assert(err <= tol, s"p=$p approx=$approx cdf=${cdf(approx)} err=$err tol=$tol")
    }
  }

  test("text_len_quantiles_by_lang: grouped sample quantiles are sane per group") {
    val sf = TestSpark.sf0001
    val rows = SparkEntry.queries("text_len_quantiles_by_lang")(spark, sf).collect()
    val exact = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy("lang")
      .agg(expr("min(n_chars)").as("mn"), expr("max(n_chars)").as("mx"),
        expr("count(*)").as("cnt"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.nonEmpty && rows.length == exact.size)
    rows.foreach { r =>
      val (mn, mx, cnt) = exact(r.getString(0))
      assert(r.getLong(3) == math.min(graft.operators.SamplingOps.GroupQuantileK, cnt))
      val (p50, p90) = (r.getLong(1), r.getLong(2))
      assert(p50 >= mn && p90 <= mx && p50 <= p90, s"$r vs ($mn,$mx)")
    }
  }
}
