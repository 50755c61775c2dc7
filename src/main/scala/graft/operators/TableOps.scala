package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Tables

/** Third analytics wave: generator/UDTF surface (explode), grouping sets,
  * deterministic hash sampling, range join via bucket-binning, and unpivot
  * (melt). The reference has none of these (SURVEY.md §2 "operators the
  * reference does NOT have"); they round out the north_star batch surface.
  *
  * Scale notes (100 TB):
  *  - explode = a Generate node inside whole-stage codegen: no shuffle until
  *    the token aggregation, which map-side combines before exchanging.
  *  - hash sampling is a pushed-down-able filter on a deterministic
  *    expression — no sort, no global pass, unlike reservoir approaches.
  *  - the range join re-expresses an inequality join as an equi-join on an
  *    aligned bucket grid + residual predicate: Spark would otherwise plan
  *    BroadcastNestedLoopJoin (per-row band scan); binning keeps it a
  *    hash join whose build side is the (tiny) exploded band×bucket dim.
  */
object TableOps {

  /** Non-overlapping [lo, hi) price bands; the last band's hi caps the
    * bucket explosion (14 buckets at width 50k).
    */
  private val Bands: Seq[(Int, Double, Double)] = Seq(
    (1, 0.0, 50000.0), (2, 50000.0, 120000.0), (3, 120000.0, 200000.0),
    (4, 200000.0, 300000.0), (5, 300000.0, 1000000.0))
  private val BucketWidth = 50000.0

  private val bandsSqlValues: String =
    Bands.map { case (id, lo, hi) => s"($id, $lo, $hi)" }.mkString(", ")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_explode_tokens" -> ((s, d) => {
      // UDTF surface: one Generate (explode) per document's ascii-letter
      // tokens, then top-30 tokens. English-only rows keep lower()
      // locale-free and byte-identical across engines.
      Tables.documents(s, d)
        .filter(col("lang") === "en")
        .select(explode(split(lower(col("text")), "[^a-z]+")).as("token"))
        .filter(length(col("token")) > 0)
        .groupBy("token")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(30)
    }),
    "q_grouping_sets" -> ((s, d) => {
      Tables.orders(s, d)
        .groupingSets(
          Seq(Seq(col("o_orderpriority")), Seq(col("o_orderstatus")), Seq()),
          col("o_orderpriority"), col("o_orderstatus"))
        .agg(
          grouping(col("o_orderpriority")).cast("int").as("g_priority"),
          grouping(col("o_orderstatus")).cast("int").as("g_status"),
          count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("total"))
    }),
    "q_hash_sample" -> ((s, d) => {
      // Deterministic 5% sample: filter on int(md5(key)[:8]) % 100 — a
      // plain pushdown-able predicate, identical in DuckDB, no RNG state.
      Tables.orders(s, d)
        .filter(expr("cast(conv(substring(md5(cast(o_orderkey as string)), 1, 8), 16, 10) as bigint) % 100 < 5"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
    }),
    "q_range_join_binned" -> ((s, d) => {
      import s.implicits._
      val bands = Bands.toDF("band_id", "lo", "hi")
        .withColumn("bucket", explode(expr(
          s"sequence(cast(floor(lo / $BucketWidth) as int), cast(floor((hi - 0.01) / $BucketWidth) as int))")))
      val o = Tables.orders(s, d)
        .withColumn("bucket", floor(col("o_totalprice") / BucketWidth).cast("int"))
      o.join(broadcast(bands), Seq("bucket"))
        .filter(col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
        .groupBy("band_id")
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
    }),
    "q_unpivot" -> ((s, d) => {
      Tables.lineitem(s, d)
        .unpivot(
          Array(col("l_returnflag")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
          "measure", "val")
        .groupBy("l_returnflag", "measure")
        .agg(count(lit(1)).as("n"), round(sum(col("val")), 2).as("total"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_explode_tokens" ->
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS token
        |      FROM documents WHERE lang = 'en')
        |WHERE length(token) > 0
        |GROUP BY token ORDER BY n DESC, token LIMIT 30""".stripMargin,
    "q_grouping_sets" ->
      """SELECT o_orderpriority, o_orderstatus,
        |  grouping(o_orderpriority)::INT AS g_priority,
        |  grouping(o_orderstatus)::INT AS g_status,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())""".stripMargin,
    "q_hash_sample" ->
      """SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |WHERE ('0x' || substr(md5(o_orderkey::VARCHAR), 1, 8))::BIGINT % 100 < 5
        |GROUP BY o_orderpriority""".stripMargin,
    "q_range_join_binned" ->
      s"""WITH bands(band_id, lo, hi) AS (VALUES $bandsSqlValues)
         |SELECT band_id, count(*) AS n, round(sum(o_totalprice), 2) AS total
         |FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
         |GROUP BY band_id""".stripMargin,
    "q_unpivot" ->
      """SELECT l_returnflag, measure, count(*) AS n, round(sum(val), 2) AS total
        |FROM (
        |  SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS val FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'l_tax', l_tax FROM lineitem)
        |GROUP BY l_returnflag, measure""".stripMargin
  )
}
