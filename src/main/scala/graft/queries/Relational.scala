package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType}

import QueryUtil._

/**
 * The relational operator surface (SURVEY.md §2.3 E1-E16 plus the
 * reference-parity queries E3). Each query is the idiomatic declarative
 * DataFrame form — Catalyst supplies pushdown, pruning, partial aggregation
 * and join selection; the only explicit physical hints are broadcasts of
 * dimension tables, which at 100 TB is the difference between a map-side
 * join and a full shuffle of the fact table.
 */
object Relational {

  // ---- reference parity (E3): job.py's two queries + the align cast ------

  private val stampProject = Q(
    "q_stamp_project",
    (s, dir) => {
      // version-stamp projection (reference job.py:42-45; SURVEY §2.1 O13/O16)
      t(s, dir, "nation")
        .withColumn("dea_version", lit("v1.0.0"))
        .orderBy("n_nationkey")
    },
    Some("""SELECT n_nationkey, n_name, n_regionkey, 'v1.0.0' AS dea_version
           |FROM nation ORDER BY n_nationkey""".stripMargin))

  private val lowerAgg = Q(
    "q_lower_agg",
    (s, dir) => {
      // GROUP BY LOWER(key) + COUNT(*) (reference job.py:52-56; O14/O15)
      t(s, dir, "customer")
        .groupBy(lower(col("c_mktsegment")).as("segment"))
        .agg(count(lit(1)).as("n"))
        .orderBy("segment")
    },
    Some("""SELECT lower(c_mktsegment) AS segment, COUNT(*) AS n
           |FROM customer GROUP BY 1 ORDER BY segment""".stripMargin))

  private val alignCast = Q(
    "q_align_cast",
    (s, dir) => {
      // schema-align select/reorder/cast (reference align_df_to_meta,
      // job.py:62,67; O17) — incl. the double->int downcast of job.py's `n`
      t(s, dir, "lineitem").select(
        col("l_orderkey"),
        col("l_linenumber"),
        col("l_quantity").cast(IntegerType).as("qty_int"),
        col("l_extendedprice").cast(DecimalType(18, 2)).cast("string").as("price_str"),
        to_date(col("l_shipdate")).as("ship_date"))
        // lineitem's (orderkey, linenumber) is NOT unique in the fixtures —
        // order by every output column for a total, engine-portable order
        .orderBy("l_orderkey", "l_linenumber", "qty_int", "price_str", "ship_date")
    },
    Some("""SELECT l_orderkey, l_linenumber,
           |  CAST(l_quantity AS INTEGER) AS qty_int,
           |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR) AS price_str,
           |  CAST(l_shipdate AS DATE) AS ship_date
           |FROM lineitem
           |ORDER BY l_orderkey, l_linenumber, qty_int, price_str, ship_date""".stripMargin))

  // ---- E4 filters --------------------------------------------------------

  private val filterBasic = Q(
    "q_filter_basic",
    (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_quantity").between(5, 15)
          && col("l_returnflag").isin("A", "R")
          && col("l_shipdate") >= lit("1995-06-01").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
           |FROM lineitem
           |WHERE l_quantity BETWEEN 5 AND 15 AND l_returnflag IN ('A','R')
           |  AND l_shipdate >= TIMESTAMP '1995-06-01'
           |ORDER BY l_orderkey, l_linenumber, l_quantity, l_returnflag""".stripMargin))

  private val filterLike = Q(
    "q_filter_like",
    (s, dir) =>
      t(s, dir, "part")
        .filter(col("p_type").like("%BRASS%") || col("p_brand").like("Brand#1%"))
        .select("p_partkey", "p_brand", "p_type")
        .orderBy("p_partkey"),
    Some("""SELECT p_partkey, p_brand, p_type FROM part
           |WHERE p_type LIKE '%BRASS%' OR p_brand LIKE 'Brand#1%'
           |ORDER BY p_partkey""".stripMargin))

  // ---- E5 string functions ----------------------------------------------

  private val stringFns = Q(
    "q_string_fns",
    (s, dir) =>
      t(s, dir, "part").select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        lower(col("p_type")).as("type_l"),
        substring(col("p_name"), 1, 8).as("name8"),
        concat_ws("|", col("p_brand"), col("p_type")).as("bt"),
        length(col("p_name")).as("name_len"),
        regexp_extract(col("p_type"), "([A-Za-z]+)", 1).as("type_first_word"),
        split(col("p_type"), " ").getItem(0).as("type_tok0"))
        .orderBy("p_partkey"),
    Some("""SELECT p_partkey, upper(p_brand) AS brand_u, lower(p_type) AS type_l,
           |  substring(p_name, 1, 8) AS name8,
           |  concat_ws('|', p_brand, p_type) AS bt,
           |  length(p_name) AS name_len,
           |  regexp_extract(p_type, '([A-Za-z]+)', 1) AS type_first_word,
           |  string_split(p_type, ' ')[1] AS type_tok0
           |FROM part ORDER BY p_partkey""".stripMargin))

  // ---- E6 date functions -------------------------------------------------

  private val dateFns = Q(
    "q_date_fns",
    (s, dir) =>
      t(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dy"),
        to_date(date_trunc("month", col("o_orderdate"))).as("month_start"),
        to_date(col("o_orderdate")).as("od"),
        datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date")).as("days_since"))
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
           |  CAST(year(o_orderdate) AS INTEGER) AS yr,
           |  CAST(month(o_orderdate) AS INTEGER) AS mo,
           |  CAST(day(o_orderdate) AS INTEGER) AS dy,
           |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           |  CAST(o_orderdate AS DATE) AS od,
           |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  // ---- E7 math / conditional --------------------------------------------

  private val mathCase = Q(
    "q_math_case",
    (s, dir) =>
      t(s, dir, "lineitem").select(
        col("l_orderkey"),
        col("l_linenumber"),
        floor(col("l_extendedprice")).cast("long").as("price_floor"),
        ceil(col("l_extendedprice")).cast("long").as("price_ceil"),
        abs(col("l_quantity") - 25).as("qty_dev"),
        when(col("l_quantity") > 25, "high")
          .when(col("l_quantity") > 10, "mid")
          .otherwise("low").as("qty_band"),
        coalesce(nullif(col("l_returnflag"), lit("N")), lit("none")).as("flag_or_none"))
        .orderBy("l_orderkey", "l_linenumber", "price_floor", "price_ceil",
          "qty_dev", "qty_band", "flag_or_none"),
    Some("""SELECT l_orderkey, l_linenumber,
           |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           |  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           |  abs(l_quantity - 25) AS qty_dev,
           |  CASE WHEN l_quantity > 25 THEN 'high'
           |       WHEN l_quantity > 10 THEN 'mid' ELSE 'low' END AS qty_band,
           |  coalesce(nullif(l_returnflag, 'N'), 'none') AS flag_or_none
           |FROM lineitem
           |ORDER BY l_orderkey, l_linenumber, price_floor, price_ceil,
           |  qty_dev, qty_band, flag_or_none""".stripMargin))

  // ---- E8 aggregates -----------------------------------------------------

  private val q1Agg = Q(
    "q1_agg",
    (s, dir) =>
      // TPC-H Q1-shaped pricing summary; partial+final HashAggregate with
      // map-side combine — the shape that scales to 100 TB.
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"),
          sum((col("l_extendedprice").cast(DecimalType(18, 2))
            * (lit(BigDecimal(1).setScale(2)) - col("l_discount").cast(DecimalType(18, 2)))))
            .cast(DoubleType).as("revenue"),
          davg(col("l_quantity")).as("avg_qty"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"),
          count(lit(1)).as("count_order"),
          countDistinct(col("l_orderkey")).as("n_orders"))
        .orderBy("l_returnflag", "l_linestatus"),
    Some(s"""SELECT l_returnflag, l_linestatus,
            |  ${oSum("l_quantity")} AS sum_qty,
            |  ${oSum("l_extendedprice")} AS sum_price,
            |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
            |  ${oAvg("l_quantity")} AS avg_qty,
            |  min(l_extendedprice) AS min_price,
            |  max(l_extendedprice) AS max_price,
            |  COUNT(*) AS count_order,
            |  COUNT(DISTINCT l_orderkey) AS n_orders
            |FROM lineitem GROUP BY l_returnflag, l_linestatus
            |ORDER BY l_returnflag, l_linestatus""".stripMargin))

  private val aggStats = Q(
    "q_agg_stats",
    (s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(
          count(lit(1)).as("n"),
          dsum(col("o_totalprice")).as("sum_total"),
          davg(col("o_totalprice")).as("avg_total"),
          min(col("o_totalprice")).as("min_total"),
          max(col("o_totalprice")).as("max_total"))
        .orderBy("o_orderstatus", "o_orderpriority"),
    Some(s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
            |  ${oSum("o_totalprice")} AS sum_total,
            |  ${oAvg("o_totalprice")} AS avg_total,
            |  min(o_totalprice) AS min_total, max(o_totalprice) AS max_total
            |FROM orders GROUP BY o_orderstatus, o_orderpriority
            |ORDER BY o_orderstatus, o_orderpriority""".stripMargin))

  // ---- E9 rollup / cube --------------------------------------------------

  private val rollupQ = Q(
    "q_rollup",
    (s, dir) =>
      t(s, dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_total"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority")),
    Some(s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
            |  ${oSum("o_totalprice")} AS sum_total
            |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
            |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin))

  private val cubeQ = Q(
    "q_cube",
    (s, dir) =>
      t(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus")),
    Some(s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
            |  ${oSum("l_quantity")} AS sum_qty
            |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
            |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin))

  // ---- E10 joins ---------------------------------------------------------

  private val joinInner = Q(
    "q_join_inner",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal"))
        .orderBy("n_name")
    },
    Some(s"""SELECT n_name, COUNT(*) AS n_cust, ${oSum("c_acctbal")} AS sum_bal
            |FROM customer JOIN nation ON c_nationkey = n_nationkey
            |GROUP BY n_name ORDER BY n_name""".stripMargin))

  private val joinThree = Q(
    "q_join_three",
    (s, dir) => {
      // region ⋈ nation ⋈ customer ⋈ orders: broadcast the dims, shuffle
      // only the two fact-side tables on their join keys.
      val r = t(s, dir, "region"); val n = t(s, dir, "nation")
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_total"))
        .orderBy("r_name")
    },
    Some(s"""SELECT r_name, COUNT(*) AS n_orders, ${oSum("o_totalprice")} AS sum_total
            |FROM orders
            |JOIN customer ON o_custkey = c_custkey
            |JOIN nation ON c_nationkey = n_nationkey
            |JOIN region ON n_regionkey = r_regionkey
            |GROUP BY r_name ORDER BY r_name""".stripMargin))

  private val joinLeft = Q(
    "q_join_left",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders
           |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
           |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin))

  private val joinFull = Q(
    "q_join_full",
    (s, dir) => {
      val cAgg = t(s, dir, "customer").groupBy(col("c_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_cust"))
      val sAgg = t(s, dir, "supplier").groupBy(col("s_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_supp"))
      cAgg.join(sAgg, Seq("nk"), "full_outer")
        .select(
          col("nk").as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy("nationkey")
    },
    Some("""SELECT COALESCE(c.nk, s.nk) AS nationkey,
           |  COALESCE(c.n_cust, 0) AS n_cust, COALESCE(s.n_supp, 0) AS n_supp
           |FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
           |FULL OUTER JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
           |  ON c.nk = s.nk
           |ORDER BY nationkey""".stripMargin))

  // ---- E11 semi / anti ---------------------------------------------------

  private val semiJoin = Q(
    "q_semi_join",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val big = t(s, dir, "orders").filter(col("o_totalprice") > 150000)
      c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name FROM customer
           |WHERE EXISTS (SELECT 1 FROM orders
           |              WHERE o_custkey = c_custkey AND o_totalprice > 150000)
           |ORDER BY c_custkey""".stripMargin))

  private val antiJoin = Q(
    "q_anti_join",
    (s, dir) => {
      // customers with no very-large order (non-empty on the fixtures —
      // every customer has SOME order, so the unfiltered anti-join is {})
      val c = t(s, dir, "customer")
      val big = t(s, dir, "orders").filter(col("o_totalprice") > 400000)
      c.join(big, c("c_custkey") === big("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name FROM customer
           |WHERE NOT EXISTS (SELECT 1 FROM orders
           |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
           |ORDER BY c_custkey""".stripMargin))

  // ---- E12 broadcast hint ------------------------------------------------

  private val broadcastJoin = Q(
    "q_broadcast_join",
    (s, dir) => {
      // explicit broadcast of the dimension: at 100 TB this must be a
      // BroadcastHashJoin, never a shuffle of `supplier`'s fact-side peer.
      val sup = t(s, dir, "supplier")
      val n = t(s, dir, "nation")
      sup.join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_supp"), dsum(col("s_acctbal")).as("sum_bal"))
        .orderBy("n_name")
    },
    Some(s"""SELECT n_name, COUNT(*) AS n_supp, ${oSum("s_acctbal")} AS sum_bal
            |FROM supplier JOIN nation ON s_nationkey = n_nationkey
            |GROUP BY n_name ORDER BY n_name""".stripMargin))

  // ---- E13 range join ----------------------------------------------------

  private val rangeJoin = Q(
    "q_range_join",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      l.join(o,
        l("l_orderkey") === o("o_orderkey")
          && l("l_shipdate") > o("o_orderdate")
          && l("l_shipdate") <= o("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS n
           |FROM lineitem JOIN orders
           |  ON l_orderkey = o_orderkey
           | AND l_shipdate > o_orderdate
           | AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
           |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))

  // ---- E14 windows -------------------------------------------------------

  private val windowRank = Q(
    "q_window_rank",
    (s, dir) => {
      val w = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, dir, "customer")
        .select(
          col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rk"),
          dense_rank().over(w).as("drk"))
        .orderBy("c_nationkey", "rn")
    },
    Some("""SELECT c_nationkey, c_custkey, c_acctbal,
           |  CAST(row_number() OVER w AS INTEGER) AS rn,
           |  CAST(rank() OVER w AS INTEGER) AS rk,
           |  CAST(dense_rank() OVER w AS INTEGER) AS drk
           |FROM customer
           |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
           |ORDER BY c_nationkey, rn""".stripMargin))

  private val windowLag = Q(
    "q_window_lag",
    (s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(
          col("o_custkey"), col("o_orderkey"),
          lag("o_orderkey", 1).over(w).as("prev_order"),
          lead("o_orderkey", 1).over(w).as("next_order"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey,
           |  lag(o_orderkey, 1) OVER w AS prev_order,
           |  lead(o_orderkey, 1) OVER w AS next_order
           |FROM orders
           |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
           |ORDER BY o_custkey, o_orderkey""".stripMargin))

  private val windowFrame = Q(
    "q_window_frame",
    (s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .select(
          col("o_custkey"), col("o_orderkey"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
            .cast(DoubleType).as("running_total"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey,
           |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
           |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
           |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin))

  // ---- E15 sort / limit / top-k -----------------------------------------

  private val topK = Q(
    "q_topk",
    (s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(10),
    Some("""SELECT o_orderkey, o_totalprice FROM orders
           |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin))

  private val topKGroup = Q(
    "q_topk_group",
    (s, dir) => {
      val w = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, dir, "customer")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("c_nationkey", "rn", "c_custkey", "c_acctbal")
        .orderBy("c_nationkey", "rn")
    },
    Some("""SELECT c_nationkey, CAST(rn AS INTEGER) AS rn, c_custkey, c_acctbal FROM (
           |  SELECT *, row_number() OVER
           |    (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
           |  FROM customer) WHERE rn <= 3
           |ORDER BY c_nationkey, rn""".stripMargin))

  // ---- E16 set operators -------------------------------------------------

  private val unionAll = Q(
    "q_union_all",
    (s, dir) => {
      val c = t(s, dir, "customer").select(col("c_nationkey").as("nk"), lit("c").as("src"))
      val sup = t(s, dir, "supplier").select(col("s_nationkey").as("nk"), lit("s").as("src"))
      c.union(sup).groupBy("nk", "src").agg(count(lit(1)).as("n")).orderBy("nk", "src")
    },
    Some("""SELECT nk, src, COUNT(*) AS n FROM (
           |  SELECT c_nationkey AS nk, 'c' AS src FROM customer
           |  UNION ALL
           |  SELECT s_nationkey AS nk, 's' AS src FROM supplier)
           |GROUP BY nk, src ORDER BY nk, src""".stripMargin))

  private val intersectQ = Q(
    "q_intersect",
    (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nk"))
        .intersect(t(s, dir, "supplier").select(col("s_nationkey").as("nk")))
        .orderBy("nk"),
    Some("""SELECT c_nationkey AS nk FROM customer
           |INTERSECT SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin))

  private val exceptQ = Q(
    "q_except",
    (s, dir) => {
      // customers with a >450k order but no <100k order (non-empty; the
      // nationkey version is {} because both sides span all 25 nations)
      val o = t(s, dir, "orders")
      o.filter(col("o_totalprice") > 450000).select(col("o_custkey").as("ck"))
        .except(o.filter(col("o_totalprice") < 100000).select(col("o_custkey").as("ck")))
        .orderBy("ck")
    },
    Some("""SELECT o_custkey AS ck FROM orders WHERE o_totalprice > 450000
           |EXCEPT SELECT o_custkey FROM orders WHERE o_totalprice < 100000
           |ORDER BY ck""".stripMargin))

  // ---- events: the streaming-analog table in batch form ------------------

  private val eventsWindow = Q(
    "q_events_window",
    (s, dir) => {
      // tumbling-window counts — batch twin of the Structured Streaming
      // query in graft.streaming.EventStreams (same date_trunc semantics).
      val ev = events(s, dir)
        .withColumn("ts_t", timestamp_micros(expr("ts DIV 1000")))
      ev.groupBy(
          unix_timestamp(date_trunc("hour", col("ts_t"))).as("win_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), dsum6(col("value")).as("sum_value"))
        .orderBy("win_start", "event_type")
    },
    Some(s"""SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS win_start,
            |  event_type, COUNT(*) AS n, ${oSum6("value")} AS sum_value
            |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin))

  val all: Seq[Q] = Seq(
    stampProject, lowerAgg, alignCast,
    filterBasic, filterLike, stringFns, dateFns, mathCase,
    q1Agg, aggStats, rollupQ, cubeQ,
    joinInner, joinThree, joinLeft, joinFull, semiJoin, antiJoin,
    broadcastJoin, rangeJoin,
    windowRank, windowLag, windowFrame,
    topK, topKGroup, unionAll, intersectQ, exceptQ,
    eventsWindow)
}
