package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType}

import QueryUtil._

/** Third relational wave: remaining window shapes (ntile, first/last,
  * RANGE frames), string/array/date function coverage, conditional and
  * percentile aggregates. */
object Relational2 {

  private val windowExtra = Q(
    "q_window_extra",
    (s, dir) => {
      val wGlobal = Window.orderBy(col("c_acctbal"), col("c_custkey"))
      val wNation = Window.partitionBy("c_nationkey")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, dir, "customer").select(
        col("c_custkey"),
        col("c_nationkey"),
        ntile(4).over(wGlobal).as("nt"),
        first(col("c_custkey")).over(wNation).as("first_ck"),
        last(col("c_custkey")).over(
          wNation.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)).as("last_ck"))
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_nationkey,
           |  CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS INTEGER) AS nt,
           |  first_value(c_custkey) OVER w AS first_ck,
           |  last_value(c_custkey) OVER
           |    (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
           |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ck
           |FROM customer
           |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
           |ORDER BY c_custkey""".stripMargin))

  private val windowRange = Q(
    "q_window_range",
    (s, dir) => {
      // RANGE frame over a numeric order key: all orders within the last
      // 100 orderkeys, not the last 100 rows
      val w = Window.partitionBy("o_orderstatus").orderBy(col("o_orderkey"))
        .rangeBetween(-100, Window.currentRow)
      t(s, dir, "orders").select(
        col("o_orderkey"),
        col("o_orderstatus"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
          .cast(DoubleType).as("near_total"))
        .orderBy("o_orderkey", "o_orderstatus")
    },
    Some("""SELECT o_orderkey, o_orderstatus,
           |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
           |    (PARTITION BY o_orderstatus ORDER BY o_orderkey
           |     RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS DOUBLE) AS near_total
           |FROM orders ORDER BY o_orderkey, o_orderstatus""".stripMargin))

  private val stringFns2 = Q(
    "q_string_fns2",
    (s, dir) =>
      t(s, dir, "part").select(
        col("p_partkey"),
        lpad(col("p_brand"), 12, "*").as("brand_pad"),
        rpad(col("p_brand"), 12, ".").as("brand_rpad"),
        regexp_replace(col("p_type"), " ", "_").as("type_snake"),
        reverse(col("p_brand")).as("brand_rev"),
        instr(col("p_type"), "BRASS").as("brass_pos"),
        translate(col("p_brand"), "#", "-").as("brand_tr"))
        .orderBy("p_partkey"),
    Some("""SELECT p_partkey,
           |  lpad(p_brand, 12, '*') AS brand_pad,
           |  rpad(p_brand, 12, '.') AS brand_rpad,
           |  replace(p_type, ' ', '_') AS type_snake,
           |  reverse(p_brand) AS brand_rev,
           |  CAST(strpos(p_type, 'BRASS') AS INTEGER) AS brass_pos,
           |  translate(p_brand, '#', '-') AS brand_tr
           |FROM part ORDER BY p_partkey""".stripMargin))

  private val arrayFns = Q(
    "q_array_fns",
    (s, dir) => {
      val toks = filter(split(lower(col("text")), " "), t => t =!= "")
      t(s, dir, "documents").select(
        col("doc_id"),
        size(toks).as("n_toks"),
        // surfaced as a joined string: the driver's pandas compare cannot
        // sort array-typed columns (round-1 q_array_fns failure)
        array_join(slice(array_sort(toks), 1, 3), " ").as("first3"),
        array_contains(toks, "data").as("has_data"),
        size(array_distinct(toks)).as("n_distinct"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
           |  CAST(len(toks) AS INTEGER) AS n_toks,
           |  array_to_string(list_sort(toks)[1:3], ' ') AS first3,
           |  list_contains(toks, 'data') AS has_data,
           |  CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct
           |FROM (SELECT doc_id,
           |        list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
           |      FROM documents)
           |ORDER BY doc_id""".stripMargin))

  private val condAgg = Q(
    "q_cond_agg",
    (s, dir) =>
      t(s, dir, "lineitem").groupBy("l_returnflag").agg(
        sum(when(col("l_quantity") > 25, 1L).otherwise(0L)).as("n_high"),
        sum(when(col("l_linestatus") === "F", col("l_extendedprice").cast(DecimalType(18, 2))))
          .cast(DoubleType).as("sum_f_price"),
        max(when(col("l_quantity") <= 10, col("l_extendedprice"))).as("max_small_price"))
        .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
           |  COUNT(*) FILTER (WHERE l_quantity > 25) AS n_high,
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS sum_f_price,
           |  max(l_extendedprice) FILTER (WHERE l_quantity <= 10) AS max_small_price
           |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  private val medianQ = Q(
    "q_median",
    (s, dir) =>
      t(s, dir, "lineitem").groupBy("l_returnflag").agg(
        expr("percentile(l_quantity, 0.5)").as("median_qty"),
        expr("percentile(l_quantity, 0.9)").as("p90_qty"))
        .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
           |  CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE) AS median_qty,
           |  CAST(quantile_cont(l_quantity, 0.9) AS DOUBLE) AS p90_qty
           |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  // Multi-quantile in ONE aggregation pass: percentile over an array of
  // fractions computes every cut from a single sorted buffer per group —
  // N quantiles for the cost of one, vs N separate percentile aggregates.
  private val quantileMulti = Q(
    "q_quantile_multi",
    (s, dir) => {
      // ONE fraction list feeds both the aggregate and the labels — a
      // second literal copy could silently drift
      val fractions = Seq(0.1, 0.25, 0.5, 0.75, 0.9)
      val ps = array(fractions.map(lit): _*)
      val fracSql = fractions.map(f => s"${f}D").mkString(", ")
      t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(expr(s"percentile(l_quantity, array($fracSql))").as("qs"))
        .select(col("l_returnflag"), posexplode(col("qs")).as(Seq("i", "qv")))
        .select(col("l_returnflag"),
          element_at(ps, col("i") + 1).as("p"), col("qv"))
        .orderBy("l_returnflag", "p")
    },
    Some("""SELECT l_returnflag,
           |  unnest([0.1, 0.25, 0.5, 0.75, 0.9]::DOUBLE[]) AS p,
           |  unnest(list_transform(
           |    quantile_cont(l_quantity, [0.1, 0.25, 0.5, 0.75, 0.9]),
           |    x -> CAST(x AS DOUBLE))) AS qv
           |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag, p""".stripMargin))

  private val dateFns2 = Q(
    "q_date_fns2",
    (s, dir) =>
      t(s, dir, "orders").select(
        col("o_orderkey"),
        add_months(to_date(col("o_orderdate")), 1).as("next_month"),
        last_day(to_date(col("o_orderdate"))).as("month_end"),
        quarter(col("o_orderdate")).as("qtr"),
        (weekday(to_date(col("o_orderdate"))) + 1).as("isodow"))
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
           |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE) AS next_month,
           |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
           |  CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
           |  CAST(isodow(CAST(o_orderdate AS DATE)) AS INTEGER) AS isodow
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  private val unpivot = Q(
    "q_unpivot",
    (s, dir) => {
      // wide → long: per-flag sums unpivoted to (flag-metric, value) rows
      val wide = t(s, dir, "lineitem").groupBy("l_linestatus").agg(
        sum(col("l_quantity").cast(DecimalType(18, 2))).cast(DoubleType).as("qty"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast(DoubleType).as("price"))
      wide.selectExpr("l_linestatus",
        "stack(2, 'qty', qty, 'price', price) AS (metric, value)")
        .orderBy("l_linestatus", "metric")
    },
    Some("""WITH wide AS (
           |  SELECT l_linestatus,
           |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
           |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS price
           |  FROM lineitem GROUP BY l_linestatus)
           |SELECT l_linestatus, 'qty' AS metric, qty AS value FROM wide
           |UNION ALL
           |SELECT l_linestatus, 'price' AS metric, price AS value FROM wide
           |ORDER BY l_linestatus, metric""".stripMargin))

  private val having = Q(
    "q_having",
    (s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_total"))
        .filter(col("n_orders") >= 15)
        .orderBy("o_custkey"),
    Some(s"""SELECT o_custkey, COUNT(*) AS n_orders, ${oSum("o_totalprice")} AS sum_total
            |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15
            |ORDER BY o_custkey""".stripMargin))

  private val scalarSubquery = Q(
    "q_scalar_subquery",
    (s, dir) => {
      // correlated scalar subquery through the SQL path — Catalyst
      // decorrelates it into a left outer aggregate join
      t(s, dir, "customer").createOrReplaceTempView("customer_v")
      t(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT c_custkey,
          |  (SELECT MAX(o_totalprice) FROM orders_v WHERE o_custkey = c_custkey) AS max_order
          |FROM customer_v ORDER BY c_custkey""".stripMargin)
    },
    Some("""SELECT c_custkey,
           |  (SELECT MAX(o_totalprice) FROM orders WHERE o_custkey = c_custkey) AS max_order
           |FROM customer ORDER BY c_custkey""".stripMargin))

  private val cte = Q(
    "q_cte",
    (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql(
        s"""WITH per_cust AS (
           |  SELECT o_custkey, COUNT(*) AS n,
           |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
           |  FROM orders_v GROUP BY o_custkey),
           |big AS (SELECT * FROM per_cust WHERE total > 2000000)
           |SELECT COUNT(*) AS n_big,
           |  CAST(SUM(CAST(total AS DECIMAL(18,2))) AS DOUBLE) AS sum_big
           |FROM big""".stripMargin)
    },
    Some("""WITH per_cust AS (
           |  SELECT o_custkey, COUNT(*) AS n,
           |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
           |  FROM orders GROUP BY o_custkey),
           |big AS (SELECT * FROM per_cust WHERE total > 2000000)
           |SELECT COUNT(*) AS n_big,
           |  CAST(SUM(CAST(total AS DECIMAL(18,2))) AS DOUBLE) AS sum_big
           |FROM big""".stripMargin))

  private val structFns = Q(
    "q_struct_fns",
    (s, dir) =>
      // struct build + nested access stay pure Project nodes — zero
      // overhead through Catalyst, and types survive the round-trip
      t(s, dir, "orders").select(
        col("o_orderkey"),
        struct(
          col("o_custkey").as("ck"),
          col("o_totalprice").as("tp"),
          struct(col("o_orderstatus").as("st")).as("inner")).as("o"))
        .select(
          col("o_orderkey"),
          col("o.ck").as("ck"),
          col("o.tp").as("tp"),
          col("o.inner.st").as("st"))
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey, o.ck AS ck, o.tp AS tp, o.inner.st AS st
           |FROM (SELECT o_orderkey,
           |        struct_pack(ck := o_custkey, tp := o_totalprice,
           |          inner := struct_pack(st := o_orderstatus)) AS o
           |      FROM orders)
           |ORDER BY o_orderkey""".stripMargin))

  private val regexExtract = Q(
    "q_regex_extract",
    (s, dir) =>
      t(s, dir, "part").select(
        col("p_partkey"),
        expr("array_join(regexp_extract_all(p_brand, '\\\\d+', 0), ',')").as("brand_nums"),
        expr("array_join(regexp_extract_all(p_type, '[A-Z]+', 0), ' ')").as("type_words"),
        regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"))
        .orderBy("p_partkey"),
    Some("""SELECT p_partkey,
           |  array_to_string(regexp_extract_all(p_brand, '\d+'), ',') AS brand_nums,
           |  array_to_string(regexp_extract_all(p_type, '[A-Z]+'), ' ') AS type_words,
           |  regexp_extract(p_name, '^(\w+)', 1) AS first_word
           |FROM part ORDER BY p_partkey""".stripMargin))

  private val windowCume = Q(
    "q_window_cume",
    (s, dir) => {
      val w = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal"), col("c_custkey"))
      t(s, dir, "customer").select(
        col("c_custkey"),
        col("c_nationkey"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_nationkey,
           |  percent_rank() OVER w AS pr,
           |  cume_dist() OVER w AS cd
           |FROM customer
           |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
           |ORDER BY c_custkey""".stripMargin))

  private val dateSeries = Q(
    "q_date_series",
    (s, dir) =>
      // explode a generated month series per order. Anchored at the FIRST
      // of the month: for month-end starts the engines disagree (Spark
      // computes start + k*month, DuckDB steps cumulatively from the last
      // clamped value — Jan 31 → Mar 31 vs Mar 28), from the 1st both are
      // identical
      t(s, dir, "orders").filter(col("o_orderkey") < 200)
        .select(col("o_orderkey"),
          explode(expr(
            "sequence(trunc(to_date(o_orderdate), 'MM'), add_months(trunc(to_date(o_orderdate), 'MM'), 3), interval 1 month)"))
            .as("month_d"))
        .orderBy("o_orderkey", "month_d"),
    Some("""SELECT o_orderkey,
           |  CAST(unnest(generate_series(date_trunc('month', CAST(o_orderdate AS DATE)),
           |    date_trunc('month', CAST(o_orderdate AS DATE)) + INTERVAL 3 MONTH,
           |    INTERVAL 1 MONTH)) AS DATE) AS month_d
           |FROM orders WHERE o_orderkey < 200
           |ORDER BY o_orderkey, month_d""".stripMargin))

  private val unionDistinct = Q(
    "q_union_distinct",
    (s, dir) => {
      val o = t(s, dir, "orders")
      o.filter(col("o_totalprice") > 400000).select(col("o_custkey").as("ck"))
        .union(o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey").as("ck")))
        .distinct()
        .orderBy("ck")
    },
    Some("""SELECT o_custkey AS ck FROM orders WHERE o_totalprice > 400000
           |UNION
           |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
           |ORDER BY ck""".stripMargin))

  private val limitOffset = Q(
    "q_limit_offset",
    (s, dir) =>
      t(s, dir, "customer")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
        .offset(20).limit(50)
        .select("c_custkey", "c_acctbal")
        .orderBy(col("c_acctbal").desc, col("c_custkey")),
    Some("""SELECT c_custkey, c_acctbal FROM customer
           |ORDER BY c_acctbal DESC, c_custkey
           |LIMIT 50 OFFSET 20""".stripMargin))

  private val windowNth = Q(
    "q_window_nth",
    (s, dir) => {
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "customer").select(
        col("c_custkey"),
        col("c_nationkey"),
        nth_value(col("c_custkey"), 3).over(w).as("third_ck"))
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_nationkey,
           |  nth_value(c_custkey, 3) OVER
           |    (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
           |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS third_ck
           |FROM customer ORDER BY c_custkey""".stripMargin))

  private val countDistinctMulti = Q(
    "q_count_distinct_multi",
    (s, dir) =>
      t(s, dir, "lineitem").groupBy("l_returnflag").agg(
        countDistinct(col("l_partkey")).as("nd_part"),
        countDistinct(col("l_suppkey"), col("l_partkey")).as("nd_supp_part"))
        .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
           |  COUNT(DISTINCT l_partkey) AS nd_part,
           |  COUNT(DISTINCT (l_suppkey, l_partkey)) AS nd_supp_part
           |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  private val stringAgg = Q(
    "q_string_agg",
    (s, dir) => {
      // deterministic listagg: collect_list is order-nondeterministic, so
      // sort the array before joining — matches string_agg(... ORDER BY)
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      n.join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name")
        .agg(array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"))
        .orderBy("r_name")
    },
    Some("""SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
           |FROM nation JOIN region ON n_regionkey = r_regionkey
           |GROUP BY r_name ORDER BY r_name""".stripMargin))

  private val mapFns = Q(
    "q_map_fns",
    (s, dir) =>
      // map build + key lookup; DuckDB map access yields a single-element
      // list, so its oracle unwraps with [1]
      t(s, dir, "orders").select(
        col("o_orderkey"),
        map(lit("st"), col("o_orderstatus"), lit("pr"), col("o_orderpriority")).as("m"))
        .select(
          col("o_orderkey"),
          element_at(col("m"), "st").as("st"),
          element_at(col("m"), "pr").as("pr"),
          size(col("m")).as("m_size"))
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey, m['st'][1] AS st, m['pr'][1] AS pr,
           |  CAST(cardinality(m) AS INTEGER) AS m_size
           |FROM (SELECT o_orderkey,
           |        map_from_entries([('st', o_orderstatus), ('pr', o_orderpriority)]) AS m
           |      FROM orders)
           |ORDER BY o_orderkey""".stripMargin))

  private val levenshteinQ = Q(
    "q_levenshtein",
    (s, dir) =>
      t(s, dir, "part").select(
        col("p_partkey"),
        levenshtein(col("p_brand"), col("p_type")).as("d_bt"),
        levenshtein(lower(col("p_name")), lower(col("p_type"))).as("d_nt"))
        .orderBy("p_partkey"),
    Some("""SELECT p_partkey,
           |  CAST(levenshtein(p_brand, p_type) AS INTEGER) AS d_bt,
           |  CAST(levenshtein(lower(p_name), lower(p_type)) AS INTEGER) AS d_nt
           |FROM part ORDER BY p_partkey""".stripMargin))

  private val bitwise = Q(
    "q_bitwise",
    (s, dir) =>
      t(s, dir, "lineitem").select(
        col("l_orderkey"),
        col("l_linenumber"),
        col("l_orderkey").bitwiseAND(col("l_partkey")).as("b_and"),
        col("l_orderkey").bitwiseOR(col("l_partkey")).as("b_or"),
        col("l_orderkey").bitwiseXOR(col("l_partkey")).as("b_xor"),
        shiftleft(col("l_linenumber"), 2).as("b_shl"))
        .orderBy("l_orderkey", "l_linenumber", "b_xor"),
    Some("""SELECT l_orderkey, l_linenumber,
           |  l_orderkey & l_partkey AS b_and,
           |  l_orderkey | l_partkey AS b_or,
           |  xor(l_orderkey, l_partkey) AS b_xor,
           |  CAST(l_linenumber << 2 AS INTEGER) AS b_shl
           |FROM lineitem ORDER BY l_orderkey, l_linenumber, b_xor""".stripMargin))

  // Bag-semantics set ops: EXCEPT ALL subtracts occurrence counts (every
  // returned shipment cancels ONE occurrence of its part), INTERSECT ALL
  // keeps the min multiplicity. Output re-aggregated so the multiset
  // result stays order-checkable.
  private val exceptAll = Q(
    "q_except_all",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      li.select("l_partkey")
        .exceptAll(li.filter(col("l_returnflag") === "R").select("l_partkey"))
        .groupBy("l_partkey").agg(count(lit(1)).as("cnt"))
        .orderBy("l_partkey")
    },
    Some("""SELECT l_partkey, COUNT(*) AS cnt FROM (
           |  SELECT l_partkey FROM lineitem
           |  EXCEPT ALL
           |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R')
           |GROUP BY l_partkey ORDER BY l_partkey""".stripMargin))

  private val intersectAll = Q(
    "q_intersect_all",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      li.filter(col("l_linestatus") === "F").select("l_partkey")
        .intersectAll(li.filter(col("l_returnflag") === "R").select("l_partkey"))
        .groupBy("l_partkey").agg(count(lit(1)).as("cnt"))
        .orderBy("l_partkey")
    },
    Some("""SELECT l_partkey, COUNT(*) AS cnt FROM (
           |  SELECT l_partkey FROM lineitem WHERE l_linestatus = 'F'
           |  INTERSECT ALL
           |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R')
           |GROUP BY l_partkey ORDER BY l_partkey""".stripMargin))

  // Fuzzy record linkage: Jaro-Winkler (native codegen'd expression,
  // graft.functions.JaroWinkler) over blocked candidate pairs — blocking
  // on (brand, size) keeps the quadratic comparison inside small groups,
  // the standard entity-resolution shape. 9dp rounding before the
  // threshold so both engines make identical keep/drop decisions.
  private val jaroPairs = Q(
    "q_jaro_pairs",
    (s, dir) => {
      graft.functions.StringFunctions.register(s)
      val p = t(s, dir, "part").select(col("p_partkey"), col("p_brand"),
        col("p_size"), col("p_name"))
      val a = p.select(col("p_partkey").as("k1"), col("p_brand"),
        col("p_size"), col("p_name").as("n1"))
      val b = p.select(col("p_partkey").as("k2"), col("p_brand"),
        col("p_size"), col("p_name").as("n2"))
      a.join(b, Seq("p_brand", "p_size")).filter(col("k1") < col("k2"))
        .withColumn("jw", round(expr("jaro_winkler(n1, n2)"), 9))
        .filter(col("jw") >= 0.6)
        .select("k1", "k2", "jw").orderBy("k1", "k2")
    },
    Some("""SELECT a.p_partkey AS k1, b.p_partkey AS k2,
           |  round(jaro_winkler_similarity(a.p_name, b.p_name), 9) AS jw
           |FROM part a JOIN part b
           |  ON a.p_brand = b.p_brand AND a.p_size = b.p_size
           | AND a.p_partkey < b.p_partkey
           |WHERE round(jaro_winkler_similarity(a.p_name, b.p_name), 9) >= 0.6
           |ORDER BY k1, k2""".stripMargin))

  // ANSI-mode-safe arithmetic: Spark 4 runs under ANSI SQL where /0 and
  // bad casts THROW; the try_* family restores the permissive null-on-
  // error semantics per-expression instead of per-session. Each output is
  // a single IEEE op or cast (no reassociated sums), so doubles hash
  // bit-exactly against DuckDB's nullif / TRY_CAST formulations.
  private val tryArith = Q(
    "q_try_arith",
    (s, dir) =>
      t(s, dir, "orders").filter(col("o_orderkey") < 2000)
        .select(
          col("o_orderkey"),
          try_divide(col("o_totalprice"), col("o_custkey") % lit(7))
            .as("price_per_bucket"),
          expr("try_cast(CASE WHEN o_orderstatus = 'O' THEN 'x' " +
            "ELSE substring(o_orderpriority, 1, 1) END AS INT)")
            .as("prio_or_null"),
          try_element_at(split(col("o_orderpriority"), " "), lit(2))
            .as("prio_word2"))
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
           |  o_totalprice / nullif(o_custkey % 7, 0) AS price_per_bucket,
           |  TRY_CAST(CASE WHEN o_orderstatus = 'O' THEN 'x'
           |    ELSE substring(o_orderpriority, 1, 1) END AS INTEGER)
           |    AS prio_or_null,
           |  string_split(o_orderpriority, ' ')[2] AS prio_word2
           |FROM orders WHERE o_orderkey < 2000
           |ORDER BY o_orderkey""".stripMargin))

  // IGNORE NULLS window navigation — the gap-fill family on a sparse
  // column (price only when the order is fulfilled): previous non-null
  // (lag), last-observation-carried-forward (last_value), and the 2nd
  // non-null seen so far (nth_value). Values pass through untouched, so
  // doubles hash exactly.
  private val windowIgnoreNulls = Q(
    "q_window_ignorenulls",
    (s, dir) => {
      val sparse = when(col("o_orderstatus") === "F", col("o_totalprice"))
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey"),
        lag(sparse, 1, null, ignoreNulls = true).over(w).as("prev_f_price"),
        last(sparse, ignoreNulls = true).over(wf).as("locf_price"),
        nth_value(sparse, 2, ignoreNulls = true).over(wf).as("second_f_price"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey,
           |  lag(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END, 1 IGNORE NULLS)
           |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
           |    AS prev_f_price,
           |  last_value(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END IGNORE NULLS)
           |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_price,
           |  nth_value(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END, 2 IGNORE NULLS)
           |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_f_price
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  // Spark 4 collations: a case-insensitive equi-join expressed as
  // UTF8_LCASE-collated equality — the engine-native replacement for
  // wrapping both keys in lower() (which blocks stats-and-index use on a
  // real catalog). The probe side is the dimension's own names uppercased,
  // so every row matches exactly its case-folded self and the hash match
  // proves collated equality ≡ the lower()-join the oracle runs.
  private val collateJoin = Q(
    "q_collate_join",
    (s, dir) => {
      val nation = t(s, dir, "nation")
      val probe = nation.select(upper(col("n_name")).as("probe_name"),
        col("n_nationkey").as("probe_key"))
      nation.join(probe,
          collate(col("n_name"), "UTF8_LCASE") ===
            collate(col("probe_name"), "UTF8_LCASE"))
        .select(col("n_nationkey"), col("n_name"), col("probe_key"))
        .orderBy("n_nationkey")
    },
    Some("""SELECT n.n_nationkey, n.n_name, p.probe_key
           |FROM nation n
           |JOIN (SELECT upper(n_name) AS probe_name, n_nationkey AS probe_key
           |      FROM nation) p
           |  ON lower(n.n_name) = lower(p.probe_name)
           |ORDER BY n.n_nationkey""".stripMargin))

  val all: Seq[Q] = Seq(
    windowExtra, windowRange, stringFns2, arrayFns, condAgg, medianQ, dateFns2,
    unpivot, having, scalarSubquery, cte,
    quantileMulti, structFns, regexExtract, windowCume, dateSeries,
    unionDistinct, limitOffset, windowNth, countDistinctMulti, stringAgg,
    mapFns, levenshteinQ, bitwise, exceptAll, intersectAll, jaroPairs,
    tryArith, collateJoin, windowIgnoreNulls)
}
