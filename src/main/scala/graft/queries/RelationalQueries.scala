package graft.queries

import graft.Tables
import graft.operators.{AsOfJoin, Sessionize}
import graft.streaming.StreamOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The [EXT] relational surface of SURVEY.md §2 (operators J2–J8, A4–A7,
  * T3, §2.7 windows, §2.8 set ops, P5 scalar functions, §2.9 batch
  * analogues) as named queries with DuckDB oracle SQL.
  *
  * Conventions for oracle parity:
  *  - every computed column is aliased IDENTICALLY in Spark and SQL;
  *  - DuckDB integer sums are cast to BIGINT (DuckDB widens to HUGEINT);
  *  - double aggregates that feed ORDER BY/LIMIT are rounded before
  *    ranking so both engines rank identical values;
  *  - all window rankings use a total order (unique tiebreak column).
  */
object RelationalQueries {
  private type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, dir: String, name: String) =
    Tables.load(s, dir, name)

  def queries: Map[String, Q] = Map(
    // A4 hash aggregate + date filter pushdown (TPC-H Q1 shape)
    "q01_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg("l_quantity"), 6).as("avg_qty"),
          round(avg("l_extendedprice"), 6).as("avg_price"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    // selective filter + scalar agg (TPC-H Q6 shape)
    "q02_revenue_filter" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01") &&
          col("l_shipdate") < lit("1998-01-01") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
          .as("revenue"), count(lit(1)).as("n_rows"))
    }),

    // J2 multiway equi join + agg + deterministic top-10 (TPC-H Q3 shape)
    "q03_shipping_priority" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders").filter(col("o_orderdate") < lit("1996-07-01"))
      val l = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1996-07-01"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(desc("revenue"), asc("l_orderkey"))
        .limit(10)
    }),

    // J4 left-semi (EXISTS)
    "q04_order_priority_exists" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem").filter(col("l_quantity") > 45)
      o.join(l, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
    }),

    // J2 five-way join through the dim chain (TPC-H Q5 shape)
    "q05_region_volume" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1998-01-01"))
      val c = t(s, dir, "customer")
      val sup = t(s, dir, "supplier")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"),
          count(lit(1)).as("n_lines"))
    }),

    // J4 left-anti (NOT EXISTS)
    "q06_cust_no_orders" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_orderdate") >= lit("2000-01-01"))
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"),
          round(sum("c_acctbal"), 2).as("sum_acctbal"))
    }),

    // J3 left outer join + two-level aggregation
    "q07_order_line_histogram" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      o.join(l, col("o_orderkey") === col("l_orderkey"), "left_outer")
        .groupBy("o_orderkey")
        .agg(count(col("l_linenumber")).as("n_lines"))
        .groupBy("n_lines")
        .agg(count(lit(1)).as("n_orders"))
    }),

    // §2.7 ranking window: top-3 orders per customer (T2 shape)
    "q08_top_orders_per_cust" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
    }),

    // §2.7 running aggregate over rows frame
    "q09_running_total" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(asc("o_orderdate"), asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
      t(s, dir, "orders")
        .withColumn("running_spend", round(sum("o_totalprice").over(w), 2))
        .select("o_custkey", "o_orderkey", "running_spend")
    }),

    // §2.7 lag + date arithmetic
    "q10_order_gaps" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(asc("o_orderdate"), asc("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
        .withColumn("gap_days",
          datediff(to_date(col("o_orderdate")), to_date(col("prev_date"))))
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          round(avg("gap_days"), 4).as("avg_gap_days"),
          max("gap_days").as("max_gap_days"))
    }),

    // A6 rollup
    "q11_rollup_region" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      // SQL ROLLUP: the Dataset rollup API trips Spark 4's
      // ambiguous-self-join detector on the Expand-duplicated grouping
      // attributes; the SQL path plans the identical Expand + aggregate.
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .select("r_name", "n_name", "c_acctbal")
        .createOrReplaceTempView("q11_joined")
      s.sql("""SELECT r_name, n_name, count(*) AS n_customers,
              |round(sum(c_acctbal), 2) AS sum_acctbal
              |FROM q11_joined GROUP BY ROLLUP (r_name, n_name)""".stripMargin)
    }),

    // A6 cube
    "q12_cube_flags" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity").as("sum_qty"),
          count(lit(1)).as("n_lines"))
    }),

    // A5 exact distinct counts
    "q13_distinct_stats" -> ((s, dir) => {
      t(s, dir, "lineitem").agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_returnflag"), col("l_linestatus")).as("n_flag_pairs"))
    }),

    // §2.8 set operations (intersect / except, both distinct-semantics)
    "q14_setops_years" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val y96 = o.filter(year(col("o_orderdate")) === 1996).select("o_custkey")
      val y97 = o.filter(year(col("o_orderdate")) === 1997).select("o_custkey")
      val both = y96.intersect(y97).agg(count(lit(1)).as("n_both"))
      val only96 = y96.except(y97).agg(count(lit(1)).as("n_only_1996"))
      val un = y96.union(y97).distinct().agg(count(lit(1)).as("n_union"))
      both.crossJoin(only96).crossJoin(un)
    }),

    // P5 string functions
    "q15_string_funcs" -> ((s, dir) => {
      t(s, dir, "part")
        .withColumn("brand_num",
          regexp_extract(col("p_brand"), "(\\d+)", 1).cast("int"))
        .withColumn("type_head", upper(substring(col("p_type"), 1, 5)))
        .groupBy("type_head")
        .agg(
          count(lit(1)).as("n_parts"),
          min(length(col("p_name"))).as("min_name_len"),
          max(length(col("p_name"))).as("max_name_len"),
          sum(when(col("p_name").like("%a%"), 1).otherwise(0)).as("n_with_a"),
          sum("brand_num").as("sum_brand_num"),
          min(concat_ws("|", lower(col("p_brand")), trim(col("p_type"))))
            .as("min_brand_type"))
    }),

    // P5 date functions
    "q16_date_funcs" -> ((s, dir) => {
      t(s, dir, "orders")
        .withColumn("yr", year(col("o_orderdate")))
        .withColumn("mo", month(col("o_orderdate")))
        .withColumn("qtr", quarter(col("o_orderdate")))
        .withColumn("mstart", date_trunc("month", col("o_orderdate")))
        .groupBy("yr", "qtr", "mo")
        .agg(count(lit(1)).as("n_orders"),
          min("mstart").as("month_start"),
          round(sum("o_totalprice"), 2).as("sum_price"))
    }),

    // P5 JSON extraction over events.props
    "q17_json_extract" -> ((s, dir) => {
      t(s, dir, "events")
        // single extraction, reused by all downstream expressions
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .withColumn("k_bucket", col("k") % 10)
        .groupBy("k_bucket")
        .agg(count(lit(1)).as("n"),
          round(avg("value"), 6).as("avg_value"),
          sum("k").as("sum_k"))
    }),

    // J2 equi join + non-equi residual
    "q18_join_residual" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val p = t(s, dir, "part")
      l.join(broadcast(p), col("l_partkey") === col("p_partkey") &&
          col("l_extendedprice") > col("p_retailprice") * 20)
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_lines"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"))
    }),

    // J5 pure theta join (nested-loop shape, broadcast the small side)
    "q19_theta_nlj" -> ((s, dir) => {
      val sup = t(s, dir, "supplier")
      val c = t(s, dir, "customer")
      sup.join(c, abs(col("s_acctbal") - col("c_acctbal")) < 50.0)
        .groupBy("s_suppkey")
        .agg(count(lit(1)).as("n_close_customers"))
    }),

    // J5 at scale: the same band predicate |s - c| < 50 as a BANDED
    // equi-join — bucket acctbal by the band width; a qualifying pair's
    // buckets differ by at most 1, so expanding one side to its bucket ±1
    // and equi-joining on bucket (+ exact residual filter) is the same
    // theta join through a hash join instead of a nested loop. The 3×
    // row expansion is the price; the O(|S|·|C|) predicate evaluation is
    // gone — the shape that survives when neither side broadcasts.
    // Same oracle as q19 proves the rewrite is semantics-preserving.
    "q70_theta_banded" -> ((s, dir) => {
      val band = 50.0
      val sup = t(s, dir, "supplier").select("s_suppkey", "s_acctbal")
      val c = t(s, dir, "customer").select("c_acctbal")
      val sb = sup.withColumn("bucket", explode(array(
        floor(col("s_acctbal") / band) - 1,
        floor(col("s_acctbal") / band),
        floor(col("s_acctbal") / band) + 1)))
      val cb = c.withColumn("bucket", floor(col("c_acctbal") / band))
      sb.join(cb, Seq("bucket"))
        .filter(abs(col("s_acctbal") - col("c_acctbal")) < band)
        .groupBy("s_suppkey")
        .agg(count(lit(1)).as("n_close_customers"))
    }),

    // J6 as-of join: latest order (by o_orderdate) at or before each event,
    // keyed user_id = o_custkey. Union+window implementation — one shuffle.
    "q20_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val o = t(s, dir, "orders")
        .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
      val joined = AsOfJoin.asOf(
        ev.select("event_id", "ts", "user_id", "event_type"),
        o.select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"),
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts", rightTime = "o_orderdate",
        rightVals = Seq("o_orderkey", "o_totalprice"),
        rightTiebreak = "o_orderkey")
      joined.groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          count(col("o_orderkey")).as("n_matched"),
          round(sum("o_totalprice"), 2).as("sum_matched_price"))
    }),

    // J6 again through the custom LogicalPlan+Strategy+Exec as-of
    // operator (same semantics and oracle as q20)
    "q52_asof_native" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val o = t(s, dir, "orders")
        .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
      val joined = graft.plans.AsOfJoinPlan.asOfNative(s,
        ev.select("event_id", "ts", "user_id", "event_type"),
        o.select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"),
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts", rightTime = "o_orderdate",
        rightVals = Seq("o_orderkey", "o_totalprice"),
        rightTiebreak = "o_orderkey")
      joined.groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          count(col("o_orderkey")).as("n_matched"),
          round(sum("o_totalprice"), 2).as("sum_matched_price"))
    }),

    // J7 interval/overlap join: same-user event pairs within 5 minutes
    "q21_interval_overlap" -> ((s, dir) => {
      val ev = t(s, dir, "events").select("event_id", "ts", "user_id")
      val e1 = ev.select(col("event_id").as("id_a"), col("ts").as("ts_a"),
        col("user_id"))
      val e2 = ev.select(col("event_id").as("id_b"), col("ts").as("ts_b"),
        col("user_id"))
      e1.join(e2, Seq("user_id"))
        .filter(col("id_a") < col("id_b") &&
          abs(unix_micros(col("ts_a").cast("timestamp")) -
            unix_micros(col("ts_b").cast("timestamp"))) <= 300000000L)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_close_pairs"))
    }),

    // J7 at scale: the SAME interval-overlap semantics as q21, but
    // banded on 5-minute time buckets (the q70 recipe applied to time):
    // one side keeps its bucket, the other explodes to {b-1, b, b+1}, so
    // the equi-join key is (user_id, bucket) and pair generation is
    // band-LOCAL — a user's quadratic blowup is confined to events that
    // are temporal neighbors, instead of all of that user's history. A
    // qualifying pair (|Δts| ≤ 300 s ⇒ |Δbucket| ≤ 1) meets on exactly
    // one bucket value, so no dedup is needed; the residual re-checks
    // the exact predicate. Same oracle as q21 proves output identity.
    "q83_interval_banded" -> ((s, dir) => {
      val bandUs = 300000000L // 5 min in microseconds = the predicate band
      val ev = t(s, dir, "events").select("event_id", "ts", "user_id")
      val e1 = ev.select(col("user_id"), col("event_id").as("id_a"),
        unix_micros(col("ts").cast("timestamp")).as("us_a"))
        .withColumn("bucket", floor(col("us_a") / bandUs))
      val e2 = ev.select(col("user_id"), col("event_id").as("id_b"),
        unix_micros(col("ts").cast("timestamp")).as("us_b"))
        .withColumn("bucket", explode(array(
          floor(col("us_b") / bandUs) - 1,
          floor(col("us_b") / bandUs),
          floor(col("us_b") / bandUs) + 1)))
      e1.join(e2, Seq("user_id", "bucket"))
        .filter(col("id_a") < col("id_b") &&
          abs(col("us_a") - col("us_b")) <= bandUs)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_close_pairs"))
    }),

    // gaps-and-islands sessionization (custom batch operator)
    "q22_sessionize" -> ((s, dir) => {
      Sessionize.sessions(t(s, dir, "events"), gapSeconds = 1800L)
        .select(col("user_id"), col("session_seq").cast("int").as("session_seq"),
          col("session_start"), col("session_end"),
          col("n_events"), round(col("sum_value"), 4).as("sum_value"))
    }),

    // ST1 batch analogue: tumbling 1-hour window aggregation
    "q23_window_hourly" -> ((s, dir) => {
      StreamOps.windowedAgg(t(s, dir, "events"), "1 hour")
        .select(col("window_start"), col("window_end"), col("event_type"),
          col("n"), round(col("sum_value"), 4).as("sum_value"))
    }),

    // ST1 sliding variant: 1-hour windows sliding every 30 minutes —
    // each event contributes to 2 windows
    "q55_window_sliding" -> ((s, dir) => {
      StreamOps.windowedAgg(t(s, dir, "events"), "1 hour",
        Some("30 minutes"))
        .select(col("window_start"), col("window_end"), col("event_type"),
          col("n"), round(col("sum_value"), 4).as("sum_value"))
    }),

    // J2 under synthetic skew: salted equi join must agree with the
    // planner's join bit-for-bit (oracle = plain SQL join)
    "q56_salted_join" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val sup = t(s, dir, "supplier")
      graft.operators.SkewJoin.saltedEquiJoin(l, sup,
        "l_suppkey", "s_suppkey", salts = 8)
        .groupBy("s_name")
        .agg(count(lit(1)).as("n_lines"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"))
    }),

    // J2 under skew, the sketch-driven form: Misra-Gries detects the
    // hot keys (one bounded-sketch pass, <= 2*capacity rows per map
    // task), ONLY their small-side rows replicate, cold keys join
    // plain — vs q56's blanket salting that replicates the whole
    // small side. Oracle = the same plain SQL join (output identity).
    "q129_sketch_skew_join" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val sup = t(s, dir, "supplier")
      graft.operators.SkewJoin.sketchSaltedEquiJoin(l, sup,
        "l_suppkey", "s_suppkey", salts = 8, capacity = 64)
        .groupBy("s_name")
        .agg(count(lit(1)).as("n_lines"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"))
    }),

    // J2 with a runtime Bloom filter: the fact side is pruned by the
    // filtered dim's Bloom bits BEFORE its exchange (the
    // InjectRuntimeFilter shape as an explicit operator). No false
    // negatives -> output row-identical to the plain join; oracle =
    // plain SQL. The measured pruning ratio is pinned in ScalaTest.
    "q130_bloom_pruned_join" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val p = t(s, dir, "part").filter(col("p_size") <= 5)
      graft.operators.BloomJoin.bloomPrunedJoin(l, p,
        "l_partkey", "p_partkey", expectedItems = 100000L)
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_lines"),
          round(sum(col("l_extendedprice")), 2).as("gross"))
    }),

    // ST2 batch analogue: built-in session_window (end = last + gap)
    "q24_session_window" -> ((s, dir) => {
      StreamOps.sessionWindowAgg(t(s, dir, "events"), "30 minutes")
        .select(col("session_start"), col("session_end"), col("user_id"),
          col("n"), round(col("sum_value"), 4).as("sum_value"))
    }),

    // §2.7 analytics: dense_rank, ntile, lead/lag, frame max
    "q25_window_analytics" -> ((s, dir) => {
      val byCust = Window.partitionBy("o_custkey")
        .orderBy(asc("o_orderdate"), asc("o_orderkey"))
      val priceRank = Window.partitionBy("o_custkey")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("seq", row_number().over(byCust))
        .withColumn("price_rank", dense_rank().over(priceRank))
        .withColumn("quartile", ntile(4).over(priceRank))
        .withColumn("next_order", lead(col("o_orderkey"), 1).over(byCust))
        .withColumn("peak_so_far", max(col("o_totalprice"))
          .over(byCust.rowsBetween(Window.unboundedPreceding, 0)))
        .select("o_custkey", "o_orderkey", "seq", "price_rank", "quartile",
          "next_order", "peak_so_far")
    }))

  def oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        |round(sum(l_extendedprice), 2) AS sum_base_price,
        |round(sum(l_extendedprice*(1-l_discount)), 2) AS sum_disc_price,
        |round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)), 2) AS sum_charge,
        |round(avg(l_quantity), 6) AS avg_qty,
        |round(avg(l_extendedprice), 6) AS avg_price,
        |round(avg(l_discount), 6) AS avg_disc, count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_revenue_filter" ->
      """SELECT round(sum(l_extendedprice*l_discount), 2) AS revenue, count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q03_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |round(sum(l_extendedprice*(1-l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |  AND l_shipdate > TIMESTAMP '1996-07-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,
    "q04_order_priority_exists" ->
      """SELECT o_orderpriority, count(*) AS order_count FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderpriority""".stripMargin,
    "q05_region_volume" ->
      """SELECT r_name, n_name,
        |round(sum(l_extendedprice*(1-l_discount)), 2) AS revenue,
        |count(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY r_name, n_name""".stripMargin,
    "q06_cust_no_orders" ->
      """SELECT c_mktsegment, count(*) AS n_customers,
        |round(sum(c_acctbal), 2) AS sum_acctbal
        |FROM customer WHERE NOT EXISTS
        |  (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |   AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c_mktsegment""".stripMargin,
    "q07_order_line_histogram" ->
      """SELECT n_lines, count(*) AS n_orders FROM (
        |  SELECT o_orderkey, count(l_linenumber) AS n_lines
        |  FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
        |  GROUP BY o_orderkey)
        |GROUP BY n_lines""".stripMargin,
    "q08_top_orders_per_cust" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,
    "q09_running_total" ->
      """SELECT o_custkey, o_orderkey,
        |round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |  ORDER BY o_orderdate ASC, o_orderkey ASC
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
        |  AS running_spend
        |FROM orders""".stripMargin,
    "q10_order_gaps" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |round(avg(gap_days), 4) AS avg_gap_days,
        |CAST(max(gap_days) AS INT) AS max_gap_days FROM (
        |  SELECT o_custkey,
        |    date_diff('day',
        |      CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate ASC, o_orderkey ASC) AS DATE),
        |      CAST(o_orderdate AS DATE)) AS gap_days
        |  FROM orders)
        |GROUP BY o_custkey""".stripMargin,
    "q11_rollup_region" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
        |round(sum(c_acctbal), 2) AS sum_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)""".stripMargin,
    "q12_cube_flags" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        |count(*) AS n_lines
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,
    "q13_distinct_stats" ->
      """SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        |CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
        |CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
        |CAST(count(DISTINCT (l_returnflag, l_linestatus)) AS BIGINT)
        |  AS n_flag_pairs
        |FROM lineitem""".stripMargin,
    "q14_setops_years" ->
      """SELECT
        |(SELECT count(*) FROM (
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate)=1996
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate)=1997))
        |  AS n_both,
        |(SELECT count(*) FROM (
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate)=1996
        |  EXCEPT
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate)=1997))
        |  AS n_only_1996,
        |(SELECT count(*) FROM (
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate)=1996
        |  UNION
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate)=1997))
        |  AS n_union""".stripMargin,
    "q15_string_funcs" ->
      """SELECT upper(substr(p_type, 1, 5)) AS type_head,
        |count(*) AS n_parts,
        |CAST(min(length(p_name)) AS INT) AS min_name_len,
        |CAST(max(length(p_name)) AS INT) AS max_name_len,
        |CAST(sum(CASE WHEN p_name LIKE '%a%' THEN 1 ELSE 0 END) AS BIGINT)
        |  AS n_with_a,
        |CAST(sum(CAST(regexp_extract(p_brand, '(\d+)', 1) AS INT)) AS BIGINT)
        |  AS sum_brand_num,
        |min(concat_ws('|', lower(p_brand), trim(p_type))) AS min_brand_type
        |FROM part GROUP BY type_head""".stripMargin,
    "q16_date_funcs" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS yr,
        |CAST(quarter(o_orderdate) AS INT) AS qtr,
        |CAST(month(o_orderdate) AS INT) AS mo,
        |count(*) AS n_orders,
        |min(date_trunc('month', o_orderdate)) AS month_start,
        |round(sum(o_totalprice), 2) AS sum_price
        |FROM orders GROUP BY yr, qtr, mo""".stripMargin,
    "q17_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10
        |  AS k_bucket,
        |count(*) AS n, round(avg(value), 6) AS avg_value,
        |CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
        |  AS sum_k
        |FROM events GROUP BY k_bucket""".stripMargin,
    "q18_join_residual" ->
      """SELECT p_brand, count(*) AS n_lines,
        |round(sum(l_extendedprice*(1-l_discount)), 2) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |  AND l_extendedprice > p_retailprice * 20
        |GROUP BY p_brand""".stripMargin,
    "q19_theta_nlj" ->
      """SELECT s_suppkey, count(*) AS n_close_customers
        |FROM supplier JOIN customer ON abs(s_acctbal - c_acctbal) < 50.0
        |GROUP BY s_suppkey""".stripMargin,
    "q70_theta_banded" ->
      """SELECT s_suppkey, count(*) AS n_close_customers
        |FROM supplier JOIN customer ON abs(s_acctbal - c_acctbal) < 50.0
        |GROUP BY s_suppkey""".stripMargin,
    "q20_asof_join" ->
      """WITH matched AS (
        |  SELECT e.event_id, e.event_type, o.o_orderkey, o.o_totalprice,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e JOIN orders o ON e.user_id = o.o_custkey
        |    AND o.o_orderdate <= e.ts),
        |best AS (SELECT * FROM matched WHERE rn = 1)
        |SELECT e.event_type, count(*) AS n_events,
        |  count(b.o_orderkey) AS n_matched,
        |  round(sum(b.o_totalprice), 2) AS sum_matched_price
        |FROM events e LEFT JOIN best b ON e.event_id = b.event_id
        |GROUP BY e.event_type""".stripMargin,
    "q52_asof_native" ->
      """WITH matched AS (
        |  SELECT e.event_id, e.event_type, o.o_orderkey, o.o_totalprice,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e JOIN orders o ON e.user_id = o.o_custkey
        |    AND o.o_orderdate <= e.ts),
        |best AS (SELECT * FROM matched WHERE rn = 1)
        |SELECT e.event_type, count(*) AS n_events,
        |  count(b.o_orderkey) AS n_matched,
        |  round(sum(b.o_totalprice), 2) AS sum_matched_price
        |FROM events e LEFT JOIN best b ON e.event_id = b.event_id
        |GROUP BY e.event_type""".stripMargin,
    "q21_interval_overlap" ->
      """SELECT a.user_id, count(*) AS n_close_pairs
        |FROM events a JOIN events b ON a.user_id = b.user_id
        |  AND a.event_id < b.event_id
        |  AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 300000000
        |GROUP BY a.user_id""".stripMargin,
    // the banded plan must be output-identical to the residual-filter one
    "q83_interval_banded" ->
      """SELECT a.user_id, count(*) AS n_close_pairs
        |FROM events a JOIN events b ON a.user_id = b.user_id
        |  AND a.event_id < b.event_id
        |  AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 300000000
        |GROUP BY a.user_id""".stripMargin,
    "q22_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts))
        |, numbered AS (
        |  SELECT user_id, ts, value,
        |    CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT)
        |      AS session_seq
        |  FROM flagged)
        |SELECT user_id, session_seq,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  count(*) AS n_events, round(sum(value), 4) AS sum_value
        |FROM numbered GROUP BY user_id, session_seq""".stripMargin,
    "q23_window_hourly" ->
      """SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))
        |  AS window_start,
        |time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))
        |  + INTERVAL '1 hour' AS window_end,
        |event_type, count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY window_start, window_end, event_type""".stripMargin,
    "q55_window_sliding" ->
      """WITH cand AS (
        |  SELECT event_type, value, ts, unnest([
        |    time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)),
        |    time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP))
        |      - INTERVAL '30 minutes']) AS window_start
        |  FROM events)
        |SELECT window_start,
        |  window_start + INTERVAL '1 hour' AS window_end,
        |  event_type, count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM cand
        |WHERE ts >= window_start AND ts < window_start + INTERVAL '1 hour'
        |GROUP BY window_start, event_type""".stripMargin,
    "q56_salted_join" ->
      """SELECT s_name, count(*) AS n_lines,
        |round(sum(l_extendedprice*(1-l_discount)), 2) AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name""".stripMargin,
    "q130_bloom_pruned_join" ->
      """SELECT p_brand, count(*) AS n_lines,
        |round(sum(l_extendedprice), 2) AS gross
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size <= 5
        |GROUP BY p_brand""".stripMargin,
    // the sketch-salted path must agree with the planner's join
    // bit-for-bit, exactly like q56
    "q129_sketch_skew_join" ->
      """SELECT s_name, count(*) AS n_lines,
        |round(sum(l_extendedprice*(1-l_discount)), 2) AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name""".stripMargin,
    "q24_session_window" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts))
        |, numbered AS (
        |  SELECT user_id, ts, value,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged)
        |SELECT min(ts) AS session_start,
        |  max(ts) + INTERVAL '30 minutes' AS session_end,
        |  user_id, count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM numbered GROUP BY user_id, sid""".stripMargin,
    "q25_window_analytics" ->
      """SELECT o_custkey, o_orderkey,
        |CAST(row_number() OVER seq_w AS INT) AS seq,
        |CAST(dense_rank() OVER price_w AS INT) AS price_rank,
        |CAST(ntile(4) OVER price_w AS INT) AS quartile,
        |lead(o_orderkey) OVER seq_w AS next_order,
        |max(o_totalprice) OVER (PARTITION BY o_custkey
        |  ORDER BY o_orderdate ASC, o_orderkey ASC
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak_so_far
        |FROM orders
        |WINDOW seq_w AS (PARTITION BY o_custkey
        |    ORDER BY o_orderdate ASC, o_orderkey ASC),
        |  price_w AS (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey ASC)""".stripMargin)
}
