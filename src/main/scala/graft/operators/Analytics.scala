package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.sources.Tables

/** Batch analytics operator surface over the driver's TPC-H-ish testdata
  * (TESTDATA.md / FIXTURES.md §B): scans with pushdown, hash aggregation,
  * every join shape (inner / left-outer / semi / anti / broadcast),
  * window functions (rank, running, range), sort / limit / top-k, set
  * operations, distinct, rollup / cube, pivot, scalar + date functions,
  * sessionization, tumbling windows, and a correlated-subquery pattern.
  *
  * Every query has a DuckDB twin with identical column names and rounding
  * (doubles are rounded at the aggregate boundary so cross-engine
  * accumulation-order noise cannot break the hash compare).
  *
  * Scale notes (100 TB design): dims that stay tiny at any SF (region,
  * nation) are broadcast explicitly; everything that grows with the data
  * (lineitem, orders, customer, part) goes through shuffle joins that AQE
  * can re-plan; aggregations are partial-before-shuffle by construction
  * (Catalyst hash aggregate); filters sit directly on the scan so they
  * reach parquet as PushedFilters.
  */
object Analytics {

  private def r2(c: Column): Column = round(c, 2)
  private def r4(c: Column): Column = round(c, 4)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- aggregation ------------------------------------------------------
    "q_pricing_summary" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          r2(sum("l_quantity")).as("sum_qty"),
          r2(sum("l_extendedprice")).as("sum_base_price"),
          r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price"),
          r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))).as("sum_charge"),
          r4(avg("l_quantity")).as("avg_qty"),
          r4(avg("l_extendedprice")).as("avg_price"),
          r4(avg("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order")
        )
    }),
    "q_forecast_revenue" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(
          col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
            col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24
        )
        .agg(r2(sum(col("l_extendedprice") * col("l_discount"))).as("revenue"))
    }),
    "q_having" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"), r2(sum("o_totalprice")).as("total_spent"))
        .filter(col("n_orders") > 10)
    }),
    // --- joins ------------------------------------------------------------
    "q_shipping_priority" -> ((s, d) => {
      val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.orders(s, d)
      val li = Tables.lineitem(s, d)
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),
    "q_local_supplier_volume" -> ((s, d) => {
      // region/nation are bounded dims at any SF → broadcast; the
      // customer⋈orders⋈lineitem⋈supplier chain shuffles on its keys.
      val nr = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      val cust = Tables.customer(s, d)
      val ord = Tables.orders(s, d)
      val li = Tables.lineitem(s, d)
      val sup = Tables.supplier(s, d)
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nr), col("s_nationkey") === col("n_nationkey"))
        .groupBy("r_name", "n_name")
        .agg(r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"),
          count(lit(1)).as("n_items"))
    }),
    "q_left_join_counts" -> ((s, d) => {
      val cust = Tables.customer(s, d)
      val ord = Tables.orders(s, d)
      cust.join(ord, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(count(col("o_orderkey")).as("n_orders"),
          r2(coalesce(sum("o_totalprice"), lit(0.0))).as("total_spent"))
    }),
    "q_semi_join" -> ((s, d) => {
      val cust = Tables.customer(s, d)
      val bigOrders = Tables.orders(s, d).filter(col("o_totalprice") > 150000)
      cust.join(bigOrders, cust("c_custkey") === bigOrders("o_custkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"))
    }),
    "q_anti_join" -> ((s, d) => {
      // customers with no single order above 250k — non-empty at every SF
      val cust = Tables.customer(s, d)
      val bigOrders = Tables.orders(s, d).filter(col("o_totalprice") > 250000)
      cust.join(bigOrders, cust("c_custkey") === bigOrders("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"), r2(sum("c_acctbal")).as("sum_bal"))
    }),
    "q_part_supplier_stats" -> ((s, d) => {
      // part grows with SF → shuffle join (AQE may still broadcast the
      // filtered side at small SF, which is exactly the desired behavior).
      val pt = Tables.part(s, d).filter(col("p_size") <= 15)
      Tables.lineitem(s, d)
        .join(pt, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(count(lit(1)).as("n_lines"), r2(sum("l_quantity")).as("sum_qty"),
          r4(avg("l_extendedprice")).as("avg_price"))
    }),
    // --- window functions -------------------------------------------------
    "q_top_orders_per_cust" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    }),
    "q_running_supplier_qty" -> ((s, d) => {
      // l_quantity closes the order (r20, found by the sf0.1 oracle):
      // the fixture's (l_orderkey, l_linenumber) is NOT unique (118k dup
      // pairs at sf0.1), and one dup pair collides on the full
      // (suppkey, shipdate, orderkey, linenumber) key with DIFFERENT
      // quantities — a ROWS running sum then depends on which engine
      // happens to order the tied pair first. With quantity in the key,
      // any remaining ties are between rows identical in every selected
      // column, so either order yields the same output multiset.
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(s, d)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_shipdate"), col("l_quantity"))
        .withColumn("running_qty", r2(sum("l_quantity").over(w)))
    }),
    "q_order_rank_in_month" -> ((s, d) => {
      val w = Window
        .partitionBy(year(col("o_orderdate")), month(col("o_orderdate")))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("yr", year(col("o_orderdate")).cast("int"))
        .withColumn("mo", month(col("o_orderdate")).cast("int"))
        .withColumn("rnk", rank().over(w))
        .filter(col("rnk") <= 5)
        .select("yr", "mo", "o_orderkey", "o_totalprice", "rnk")
    }),
    // --- sort / limit / top-k --------------------------------------------
    "q_top_lineitems" -> ((s, d) => {
      Tables.lineitem(s, d)
        // l_quantity closes the order over the non-unique (ok, ln) key —
        // same r20 fixture-duplicate class as q_running_supplier_qty
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
          col("l_linenumber"), col("l_quantity"))
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity")
        .limit(20)
    }),
    // --- distinct / set ops ----------------------------------------------
    "q_distinct_parts" -> ((s, d) => {
      Tables.lineitem(s, d).agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_partkey"), col("l_suppkey")).as("n_part_supp")
      )
    }),
    "q_setops" -> ((s, d) => {
      val cust = Tables.customer(s, d)
      val a = cust.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val b = cust.filter(col("c_acctbal") > 5000).select("c_custkey")
      val u = a.union(b).distinct().agg(count(lit(1)).as("n_union"))
      val i = a.intersect(b).agg(count(lit(1)).as("n_intersect"))
      val e = a.except(b).agg(count(lit(1)).as("n_except"))
      u.crossJoin(i).crossJoin(e)
    }),
    // --- rollup / cube / pivot -------------------------------------------
    "q_rollup" -> ((s, d) => {
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(r2(sum("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
    }),
    "q_cube" -> ((s, d) => {
      Tables.orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), r2(sum("o_totalprice")).as("total"))
    }),
    "q_pivot_returnflag" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_linestatus")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(r2(sum("l_quantity")))
    }),
    // --- scalar / date functions -----------------------------------------
    "q_orders_by_month" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(year(col("o_orderdate")).cast("int").as("yr"),
          month(col("o_orderdate")).cast("int").as("mo"))
        .agg(count(lit(1)).as("n_orders"), r2(sum("o_totalprice")).as("total"),
          r4(avg("o_totalprice")).as("avg_price"))
    }),
    "q_string_funcs" -> ((s, d) => {
      Tables.part(s, d).select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_up"),
        length(col("p_name")).cast("int").as("name_len"),
        substring(col("p_type"), 1, 6).as("type_pfx"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        when(col("p_retailprice") > 1500, "premium")
          .when(col("p_retailprice") > 1000, "standard")
          .otherwise("budget").as("tier")
      )
    }),
    "q_acctbal_buckets" -> ((s, d) => {
      Tables.customer(s, d)
        .withColumn("bucket",
          when(col("c_acctbal") < 0, "negative")
            .when(col("c_acctbal") < 2500, "low")
            .when(col("c_acctbal") < 7500, "mid")
            .otherwise("high"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), r2(sum("c_acctbal")).as("sum_bal"),
          r2(min("c_acctbal")).as("min_bal"), r2(max("c_acctbal")).as("max_bal"))
    }),
    // --- event-stream batch shapes ---------------------------------------
    "q_sessionize" -> ((s, d) => {
      // Gap-based sessionization (30 min): the lag/cum-sum formulation is
      // the batch dual of a streaming session window.
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ms"), col("event_id"))
      Tables.eventsNormalized(s, d)
        .withColumn("ms", col("ts_ms"))
        .withColumn("prev_ms", lag(col("ms"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_ms").isNull || col("ms") - col("prev_ms") > 30 * 60 * 1000L, 1L).otherwise(0L))
        .withColumn("sess_id", sum("new_sess").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sess_id")
        .agg(min("ms").as("sess_start_ms"), max("ms").as("sess_end_ms"),
          count(lit(1)).as("n_events"), r2(sum("value")).as("sum_value"))
    }),
    "q_tumbling_hour" -> ((s, d) => {
      Tables.eventsNormalized(s, d)
        // date_trunc yields LTZ; cast back to NTZ (session TZ is UTC, so
        // identity) to keep the parquet output µs like the source tables.
        .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), r2(sum("value")).as("sum_value"))
    }),
    // --- cohort retention -------------------------------------------------
    "q_cohort_retention" -> ((s, d) => {
      // users bucketed by first-event week; distinct actives per
      // (cohort, week offset). Week ids are pure ms arithmetic (no date
      // functions → no tz/dtype traps), and both aggregations are
      // map-side-combined groupBys on user_id.
      val e = Tables.eventsNormalized(s, d).select(col("user_id"), col("ts_ms"))
      val firstWeek = e.groupBy("user_id").agg(min("ts_ms").as("first_ms"))
        .withColumn("cohort_week", expr("first_ms div 604800000"))
        .select("user_id", "cohort_week")
      e.withColumn("week", expr("ts_ms div 604800000"))
        .select("user_id", "week").distinct()
        .join(firstWeek, "user_id")
        .withColumn("week_offset", col("week") - col("cohort_week"))
        .groupBy("cohort_week", "week_offset")
        .agg(countDistinct("user_id").as("n_users"))
    }),
    // --- funnel conversion --------------------------------------------------
    "q_funnel_steps" -> ((s, d) => {
      // ordered signup → view → purchase funnel: each stage is a
      // min-timestamp aggregate joined back so the next stage only counts
      // events strictly after the previous stage's completion. Three
      // user_id-keyed shuffles, all partial-aggregated; the final one-row
      // summary composes broadcast scalar cross joins.
      val e = Tables.eventsNormalized(s, d)
        .select(col("user_id"), col("event_type"), col("ts_ms").as("ms"))
      val s1 = e.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("ms").as("t_signup"))
      val s2 = e.join(s1, "user_id")
        .filter(col("event_type") === "view" && col("ms") > col("t_signup"))
        .groupBy("user_id").agg(min("ms").as("t_view"))
      val s3 = e.join(s2, "user_id")
        .filter(col("event_type") === "purchase" && col("ms") > col("t_view"))
        .groupBy("user_id").agg(min("ms").as("t_purchase"))
      e.agg(countDistinct("user_id").as("n_users"))
        .crossJoin(broadcast(s1.agg(count(lit(1)).as("n_signup"))))
        .crossJoin(broadcast(s2.agg(count(lit(1)).as("n_signup_view"))))
        .crossJoin(broadcast(s3.agg(count(lit(1)).as("n_full_funnel"))))
        .select(col("n_users"), col("n_signup"), col("n_signup_view"),
          col("n_full_funnel"),
          round(col("n_signup_view") / col("n_signup"), 4).as("view_rate"),
          round(col("n_full_funnel") / col("n_signup_view"), 4).as("purchase_rate"))
    }),
    // --- correlated-subquery pattern -------------------------------------
    "q_small_quantity_revenue" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val avgQty = li.groupBy(col("l_partkey").as("ap_partkey"))
        .agg((avg("l_quantity") * 0.5).as("half_avg_qty"))
      li.join(avgQty, col("l_partkey") === col("ap_partkey"))
        .filter(col("l_quantity") < col("half_avg_qty"))
        .agg(r2(sum(col("l_extendedprice")) / 7.0).as("avg_yearly"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q_forecast_revenue" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q_having" ->
      """SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_spent
        |FROM orders GROUP BY o_custkey HAVING count(*) > 10""".stripMargin,
    "q_shipping_priority" ->
      """SELECT o_orderkey, o_orderdate, o_orderpriority,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q_local_supplier_volume" ->
      """SELECT r_name, n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q_left_join_counts" ->
      """SELECT c_custkey, c_mktsegment, count(o_orderkey) AS n_orders,
        |  round(coalesce(sum(o_totalprice), 0), 2) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_mktsegment""".stripMargin,
    "q_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 150000)
        |GROUP BY c_mktsegment""".stripMargin,
    "q_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers, round(sum(c_acctbal), 2) AS sum_bal
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 250000)
        |GROUP BY c_mktsegment""".stripMargin,
    "q_part_supplier_stats" ->
      """SELECT p_brand, p_type, count(*) AS n_lines,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size <= 15
        |GROUP BY p_brand, p_type""".stripMargin,
    "q_top_orders_per_cust" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rk
        |  FROM orders) t WHERE rk <= 3""".stripMargin,
    "q_running_supplier_qty" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate, l_quantity,
        |  round(sum(l_quantity) OVER (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
        |FROM lineitem""".stripMargin,
    "q_order_rank_in_month" ->
      """SELECT yr, mo, o_orderkey, o_totalprice, rnk FROM (
        |  SELECT CAST(year(o_orderdate) AS INT) AS yr, CAST(month(o_orderdate) AS INT) AS mo,
        |    o_orderkey, o_totalprice,
        |    CAST(rank() OVER (PARTITION BY year(o_orderdate), month(o_orderdate)
        |      ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rnk
        |  FROM orders) t WHERE rnk <= 5""".stripMargin,
    "q_top_lineitems" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber, l_quantity LIMIT 20""".stripMargin,
    "q_distinct_parts" ->
      """SELECT count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(DISTINCT (l_partkey, l_suppkey)) AS n_part_supp
        |FROM lineitem""".stripMargin,
    "q_setops" ->
      """SELECT
        |  (SELECT count(*) FROM (
        |     SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |     UNION SELECT c_custkey FROM customer WHERE c_acctbal > 5000)) AS n_union,
        |  (SELECT count(*) FROM (
        |     SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |     INTERSECT SELECT c_custkey FROM customer WHERE c_acctbal > 5000)) AS n_intersect,
        |  (SELECT count(*) FROM (
        |     SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |     EXCEPT SELECT c_custkey FROM customer WHERE c_acctbal > 5000)) AS n_except""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin,
    "q_pivot_returnflag" ->
      """SELECT l_linestatus,
        |  round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2) AS "A",
        |  round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2) AS "N",
        |  round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2) AS "R"
        |FROM lineitem GROUP BY l_linestatus""".stripMargin,
    "q_orders_by_month" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS yr, CAST(month(o_orderdate) AS INT) AS mo,
        |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS total,
        |  round(avg(o_totalprice), 4) AS avg_price
        |FROM orders GROUP BY 1, 2""".stripMargin,
    "q_string_funcs" ->
      """SELECT p_partkey, upper(p_brand) AS brand_up,
        |  CAST(length(p_name) AS INT) AS name_len,
        |  substr(p_type, 1, 6) AS type_pfx,
        |  concat_ws('|', p_brand, p_type) AS brand_type,
        |  CASE WHEN p_retailprice > 1500 THEN 'premium'
        |       WHEN p_retailprice > 1000 THEN 'standard'
        |       ELSE 'budget' END AS tier
        |FROM part""".stripMargin,
    "q_acctbal_buckets" ->
      """SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
        |            WHEN c_acctbal < 2500 THEN 'low'
        |            WHEN c_acctbal < 7500 THEN 'mid'
        |            ELSE 'high' END AS bucket,
        |  count(*) AS n, round(sum(c_acctbal), 2) AS sum_bal,
        |  round(min(c_acctbal), 2) AS min_bal, round(max(c_acctbal), 2) AS max_bal
        |FROM customer GROUP BY 1""".stripMargin,
    "q_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ms, value FROM events
        |), g AS (
        |  SELECT *, CASE WHEN lag(ms) OVER w IS NULL OR ms - lag(ms) OVER w > 1800000
        |                 THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)
        |), ss AS (
        |  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ms, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
        |  FROM g
        |)
        |SELECT user_id, sess_id, min(ms) AS sess_start_ms, max(ms) AS sess_end_ms,
        |  count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM ss GROUP BY user_id, sess_id""".stripMargin,
    "q_tumbling_hour" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |  count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_cohort_retention" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) ms FROM events),
        |fw AS (SELECT user_id, min(ms) // 604800000 cohort_week FROM e GROUP BY user_id),
        |act AS (SELECT DISTINCT user_id, ms // 604800000 wk FROM e)
        |SELECT cohort_week, wk - cohort_week week_offset,
        |  count(DISTINCT user_id) n_users
        |FROM act JOIN fw USING (user_id)
        |GROUP BY 1, 2""".stripMargin,
    "q_funnel_steps" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) ms FROM events),
        |s1 AS (SELECT user_id, min(ms) t_signup FROM e
        |       WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(ms) t_view FROM e JOIN s1 USING (user_id)
        |       WHERE event_type = 'view' AND ms > t_signup GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(ms) t_purchase FROM e JOIN s2 USING (user_id)
        |       WHERE event_type = 'purchase' AND ms > t_view GROUP BY e.user_id)
        |SELECT (SELECT count(DISTINCT user_id) FROM e)::BIGINT n_users,
        |  (SELECT count(*) FROM s1)::BIGINT n_signup,
        |  (SELECT count(*) FROM s2)::BIGINT n_signup_view,
        |  (SELECT count(*) FROM s3)::BIGINT n_full_funnel,
        |  round((SELECT count(*) FROM s2) / (SELECT count(*) FROM s1)::DOUBLE, 4) view_rate,
        |  round((SELECT count(*) FROM s3) / (SELECT count(*) FROM s2)::DOUBLE, 4) purchase_rate""".stripMargin,
    "q_small_quantity_revenue" ->
      """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        |FROM lineitem l
        |JOIN (SELECT l_partkey AS ap_partkey, avg(l_quantity) * 0.5 AS half_avg_qty
        |      FROM lineitem GROUP BY l_partkey) a
        |  ON l.l_partkey = a.ap_partkey
        |WHERE l.l_quantity < a.half_avg_qty""".stripMargin
  )
}
