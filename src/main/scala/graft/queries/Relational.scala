package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational query pack.
  *
  * Each query re-expresses an aggregation / join / window shape the reference
  * engine (mukul975/mcp-web-scrape) exercises — cache stats
  * (src/cache.ts:116-141), per-hour uptime stats (src/server.ts:6040-6075),
  * frontier rank-budget windows (the north rule's
  * `Window.partitionBy(host).orderBy(priority, next_fetch_time)`), seen-set
  * anti-joins (src/server.ts:3527-3575) — as idiomatic Spark over the test
  * tables, with a DuckDB-runnable ANSI-SQL oracle.
  *
  * Conventions for oracle parity:
  *  - money/doubles surfaced as `CAST(round(x*100) AS BIGINT)` cents so the
  *    driver's value hash can't be tripped by float formatting;
  *  - every query has a total deterministic ORDER BY;
  *  - column names aliased identically on both sides.
  */
object Relational {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100).cast("long")

  val specs: Seq[QuerySpec] = Seq(
    // --- cache stats: count/sum/min/max over the "cache" table ------------
    QuerySpec(
      "q01_cache_stats",
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.agg(
          count(lit(1)).as("n_entries"),
          cents(sum(col("o_totalprice"))).as("total_cents"),
          date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("oldest"),
          date_format(max(col("o_orderdate")), "yyyy-MM-dd").as("newest"))
      },
      Some("""SELECT count(*) AS n_entries,
             |       CAST(round(sum(o_totalprice)*100) AS BIGINT) AS total_cents,
             |       strftime(min(o_orderdate), '%Y-%m-%d') AS oldest,
             |       strftime(max(o_orderdate), '%Y-%m-%d') AS newest
             |FROM orders""".stripMargin)),

    // --- group-agg: revenue per returnflag/linestatus (TPC-H Q1 shape) ----
    QuerySpec(
      "q02_agg_revenue",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        l.filter(col("l_shipdate") < lit("1998-09-01").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("l_quantity")).cast("long").as("sum_qty"),
            cents(sum(col("l_extendedprice"))).as("base_cents"),
            cents(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("disc_cents"),
            count(lit(1)).as("n_rows"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
             |       CAST(round(sum(l_extendedprice)*100) AS BIGINT) AS base_cents,
             |       CAST(round(sum(l_extendedprice*(1-l_discount))*100) AS BIGINT) AS disc_cents,
             |       count(*) AS n_rows
             |FROM lineitem
             |WHERE l_shipdate < TIMESTAMP '1998-09-01 00:00:00'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // --- rank-budget window: the frontier politeness rank (north rule) ----
    // row_number over (partition, priority) with per-partition budget K —
    // identical shape to ranking frontier URLs per host and keeping the
    // first `hostBudget` (src/fetch.ts:44-59 token bucket, distributed).
    QuerySpec(
      "q03_rank_budget",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val w = Window.partitionBy(col("c_nationkey"))
          .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
        c.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select(col("c_nationkey"), col("rank"), col("c_custkey"),
            cents(col("c_acctbal")).as("acctbal_cents"))
          .orderBy(col("c_nationkey"), col("rank"))
      },
      Some("""SELECT c_nationkey, rank, c_custkey, acctbal_cents FROM (
             |  SELECT c_nationkey, c_custkey,
             |         CAST(round(c_acctbal*100) AS BIGINT) AS acctbal_cents,
             |         row_number() OVER (PARTITION BY c_nationkey
             |                            ORDER BY c_acctbal DESC, c_custkey ASC) AS rank
             |  FROM customer)
             |WHERE rank <= 3
             |ORDER BY c_nationkey, rank""".stripMargin)),

    // --- seen-set anti-join: "not yet visited" (src/server.ts:3573-3575) --
    QuerySpec(
      "q04_seen_antijoin",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
          .filter(col("o_totalprice") > 150000.0)
          .select(col("o_custkey"))
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey AND o_totalprice > 150000.0)
             |ORDER BY c_custkey""".stripMargin)),

    // --- 3-way join + agg (broadcast dims): revenue by market segment -----
    QuerySpec(
      "q05_revenue_by_segment",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer")
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(
            cents(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_cents"),
            count(lit(1)).as("n_items"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""SELECT c_mktsegment,
             |       CAST(round(sum(l_extendedprice*(1-l_discount))*100) AS BIGINT) AS revenue_cents,
             |       count(*) AS n_items
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment
             |ORDER BY c_mktsegment""".stripMargin)),

    // --- change detection via lag window (monitor_changes,
    //     src/server.ts:3268-3347: current vs previous snapshot) ----------
    QuerySpec(
      "q06_change_lag",
      (s, dir) => {
        val e = t(s, dir, "events")
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        e.withColumn("prev", lag(col("value"), 1).over(w))
          .filter(col("prev").isNotNull && abs(col("value") - col("prev")) > 100.0)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_changes"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, count(*) AS n_changes FROM (
             |  SELECT user_id, value,
             |         lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
             |  FROM events)
             |WHERE prev IS NOT NULL AND abs(value - prev) > 100.0
             |GROUP BY user_id
             |ORDER BY user_id""".stripMargin)),

    // --- per-hour stats (monitor_uptime hourly groupBy,
    //     src/server.ts:6058-6075) ----------------------------------------
    QuerySpec(
      "q07_hourly_stats",
      (s, dir) => {
        val e = t(s, dir, "events")
        e.groupBy(
            date_format(col("ts"), "yyyy-MM-dd HH").as("hour"),
            col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            cents(min(col("value"))).as("min_cents"),
            cents(max(col("value"))).as("max_cents"),
            cents(sum(col("value"))).as("sum_cents"))
          .orderBy(col("hour"), col("event_type"))
      },
      Some("""SELECT strftime(ts, '%Y-%m-%d %H') AS hour, event_type,
             |       count(*) AS n,
             |       CAST(round(min(value)*100) AS BIGINT) AS min_cents,
             |       CAST(round(max(value)*100) AS BIGINT) AS max_cents,
             |       CAST(round(sum(value)*100) AS BIGINT) AS sum_cents
             |FROM events
             |GROUP BY 1, 2
             |ORDER BY hour, event_type""".stripMargin)),

    // --- JSON field extraction (structured-data harvest,
    //     src/server.ts:2015-2305 JSON-LD parse) --------------------------
    QuerySpec(
      "q08_json_extract",
      (s, dir) => {
        val e = t(s, dir, "events")
        e.withColumn("k", regexp_extract(col("props"), "[0-9]+", 0).cast("long"))
          .groupBy(col("event_type"))
          .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type,
             |       CAST(sum(CAST(regexp_extract(props, '[0-9]+') AS BIGINT)) AS BIGINT) AS sum_k,
             |       count(*) AS n
             |FROM events
             |GROUP BY event_type
             |ORDER BY event_type""".stripMargin)),

    // --- top-k per group: each customer's 3 largest orders ---------------
    QuerySpec(
      "q70_topk_orders",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        o.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("o_custkey"), col("rk"), col("o_orderkey"),
            cents(col("o_totalprice")).as("price_cents"))
          .orderBy(col("o_custkey"), col("rk"))
      },
      Some("""SELECT o_custkey, rk, o_orderkey, price_cents FROM (
             |  SELECT o_custkey, o_orderkey,
             |         CAST(round(o_totalprice*100) AS BIGINT) AS price_cents,
             |         row_number() OVER (PARTITION BY o_custkey
             |                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
             |  FROM orders)
             |WHERE rk <= 3
             |ORDER BY o_custkey, rk""".stripMargin)),

    // --- dimension rollup: supplier balance by region via nation ---------
    QuerySpec(
      "q71_region_rollup",
      (s, dir) => {
        val sup = t(s, dir, "supplier")
        val n = t(s, dir, "nation")
        val r = t(s, dir, "region")
        sup.join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(count(lit(1)).as("n_suppliers"),
            cents(sum(col("s_acctbal"))).as("bal_cents"))
          .orderBy(col("r_name"))
      },
      Some("""SELECT r_name, count(*) AS n_suppliers,
             |       CAST(round(sum(s_acctbal)*100) AS BIGINT) AS bal_cents
             |FROM supplier
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name
             |ORDER BY r_name""".stripMargin)),

    // --- distinct counting: unique users per event type -------------------
    QuerySpec(
      "q72_distinct_users",
      (s, dir) => {
        val e = t(s, dir, "events")
        e.groupBy(col("event_type"))
          .agg(countDistinct(col("user_id")).as("n_users"),
            count(lit(1)).as("n_events"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(DISTINCT user_id) AS n_users,
             |       count(*) AS n_events
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // --- bucketed histogram: part sizes by price decile -------------------
    QuerySpec(
      "q73_price_buckets",
      (s, dir) => {
        val p = t(s, dir, "part")
        p.withColumn("bucket", floor(col("p_retailprice") / 200).cast("long"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n"),
            min(col("p_size")).as("min_size"),
            max(col("p_size")).as("max_size"))
          .orderBy(col("bucket"))
      },
      Some("""SELECT CAST(floor(p_retailprice / 200) AS BIGINT) AS bucket,
             |       count(*) AS n, min(p_size) AS min_size, max(p_size) AS max_size
             |FROM part GROUP BY 1 ORDER BY bucket""".stripMargin)),

    // --- outage-island detection (monitor_uptime outage intervals,
    //     src/server.ts:6040-6056): lag + conditional cumulative sum ------
    QuerySpec(
      "q09_islands",
      (s, dir) => {
        val e = t(s, dir, "events")
        val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val down = e.withColumn("is_err", (col("event_type") === "error").cast("int"))
          .withColumn("prev_err", lag(col("is_err"), 1, 0).over(byUser))
          .withColumn("island_start",
            (col("is_err") === 1 && col("prev_err") === 0).cast("int"))
        down.groupBy(col("user_id"))
          .agg(
            sum(col("is_err")).cast("long").as("n_err"),
            sum(col("island_start")).cast("long").as("n_outages"))
          .filter(col("n_err") > 0)
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id,
             |       CAST(sum(is_err) AS BIGINT) AS n_err,
             |       CAST(sum(island_start) AS BIGINT) AS n_outages
             |FROM (
             |  SELECT user_id, is_err,
             |         CASE WHEN is_err = 1 AND
             |              coalesce(lag(is_err) OVER (PARTITION BY user_id ORDER BY ts, event_id), 0) = 0
             |              THEN 1 ELSE 0 END AS island_start
             |  FROM (SELECT user_id, ts, event_id,
             |               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
             |        FROM events))
             |GROUP BY user_id
             |HAVING sum(is_err) > 0
             |ORDER BY user_id""".stripMargin))
  )
}
