package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.ops.TimeOps
import QueryUtil._

/**
 * Second wave of the operator surface: SQL-text entry point, grouping
 * sets, right outer join, null-safe equality, JSON extraction, as-of
 * join, sessionization, approximate distinct.
 */
object Advanced {


  private val groupingSets = Q(
    "q_grouping_sets",
    (s, dir) => {
      // the SQL-text path: parse → analyze against a temp view (job.py:39-56 shape)
      t(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
          |FROM orders_v
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)
    },
    Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
           |FROM orders
           |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
           |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin))

  private val joinRight = Q(
    "q_join_right",
    (s, dir) => {
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 300000)
      val c = t(s, dir, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"), "right")
        .groupBy("c_custkey", "c_name")
        .agg(count(col("o_orderkey")).as("n_big_orders"))
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_big_orders
           |FROM (SELECT * FROM orders WHERE o_totalprice > 300000) o
           |RIGHT JOIN customer ON o_custkey = c_custkey
           |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin))

  private val nullSafeEq = Q(
    "q_null_safe_eq",
    (s, dir) =>
      t(s, dir, "customer")
        .select(
          nullif(col("c_mktsegment"), lit("BUILDING")).as("a"),
          nullif(col("c_mktsegment"), lit("AUTOMOBILE")).as("b"))
        .groupBy((col("a") <=> col("b")).as("eq"), col("a").isNull.as("a_null"))
        .agg(count(lit(1)).as("n"))
        .orderBy("eq", "a_null"),
    Some("""SELECT a IS NOT DISTINCT FROM b AS eq, a IS NULL AS a_null, COUNT(*) AS n
           |FROM (SELECT nullif(c_mktsegment, 'BUILDING') AS a,
           |             nullif(c_mktsegment, 'AUTOMOBILE') AS b FROM customer)
           |GROUP BY 1, 2 ORDER BY eq, a_null""".stripMargin))

  private val sqlEntry = Q(
    "q_sql_entry",
    (s, dir) => {
      // TPC-H Q3-shaped query entirely through spark.sql — exercises the
      // parser/analyzer path against temp views, with the same exact-
      // decimal revenue formulation as q1_agg
      t(s, dir, "customer").createOrReplaceTempView("customer_v")
      t(s, dir, "orders").createOrReplaceTempView("orders_v")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
      s.sql(
        """SELECT o_orderkey,
          |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
          |    * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
          |FROM customer_v, orders_v, lineitem_v
          |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
          |GROUP BY o_orderkey
          |ORDER BY revenue DESC, o_orderkey LIMIT 20""".stripMargin)
    },
    Some("""SELECT o_orderkey,
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           |    * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
           |FROM customer, orders, lineitem
           |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
           |GROUP BY o_orderkey
           |ORDER BY revenue DESC, o_orderkey LIMIT 20""".stripMargin))

  private val jsonExtract = Q(
    "q_json_extract",
    (s, dir) =>
      events(s, dir).select(
        col("event_id"),
        col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
        .orderBy("event_id"),
    Some("""SELECT event_id, event_type,
           |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
           |FROM events ORDER BY event_id""".stripMargin))

  private val asofJoin = Q(
    "q_asof_join",
    (s, dir) => {
      // timestamps in MICROS on both engines: Spark truncates its nanos
      // long with DIV 1000; DuckDB's ns parquet reads as µs TIMESTAMP
      val ev = events(s, dir).withColumn("ts_us", expr("ts DIV 1000"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_us").as("pts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_us").as("cts"),
          col("event_id").as("click_id"), col("ts_us").as("click_ts"))
      TimeOps.asofJoinBackward(purchases, clicks,
        key = "user_id", leftTs = "pts", rightTs = "cts",
        rightPayload = Seq("click_id", "click_ts"))
        .orderBy("event_id")
    },
    Some("""WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS pts
           |           FROM events WHERE event_type = 'purchase'),
           |c AS (SELECT event_id AS click_id, user_id, epoch_us(ts) AS cts
           |      FROM events WHERE event_type = 'click')
           |SELECT p.event_id, p.user_id, p.pts, c.click_id, c.cts AS click_ts
           |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.pts >= c.cts
           |ORDER BY p.event_id""".stripMargin))

  // The NATIVE as-of join physical operator (plans/AsofJoinNative): same
  // contract as q_asof_join but planned as AsofJoinExec — one two-pointer
  // merge per co-partition instead of union+window. Same DuckDB ASOF
  // oracle: the hash match proves the custom exec's semantics.
  private val asofNative = Q(
    "q_asof_native",
    (s, dir) => {
      val ev = events(s, dir).withColumn("ts_us", expr("ts DIV 1000"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_us").as("pts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_us").as("cts"),
          col("event_id").as("click_id"), col("ts_us").as("click_ts"))
      graft.plans.AsofJoinNative.join(purchases, clicks,
        key = "user_id", leftTs = "pts", rightTs = "cts",
        payload = Seq("click_id", "click_ts"))
        .orderBy("event_id")
    },
    Some("""WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS pts
           |           FROM events WHERE event_type = 'purchase'),
           |c AS (SELECT event_id AS click_id, user_id, epoch_us(ts) AS cts
           |      FROM events WHERE event_type = 'click')
           |SELECT p.event_id, p.user_id, p.pts, c.click_id, c.cts AS click_ts
           |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.pts >= c.cts
           |ORDER BY p.event_id""".stripMargin))

  // Point-in-time feature join (the feature-store training-data rule):
  // each purchase is enriched with its latest PRIOR click only when that
  // click is within a 6-hour staleness tolerance — later features would
  // be leakage, staler ones are served as NULL exactly like a feature
  // store would. Same merge shape as the as-of join (one co-partitioned
  // pass, no inequality explosion); the tolerance is a post-match
  // projection, and the within_tolerance flag makes the fresh/stale
  // split auditable (209 of 1981 purchases fresh at sf0.01).
  private val pitJoin = Q(
    "q_pit_join",
    (s, dir) => {
      val tolUs = 6L * 3600 * 1000000
      val ev = events(s, dir).withColumn("ts_us", expr("ts DIV 1000"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_us").as("pts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_us").as("cts"),
          col("event_id").as("click_id"), col("ts_us").as("click_ts"))
      val fresh = col("click_ts").isNotNull &&
        col("pts") - col("click_ts") <= tolUs
      TimeOps.asofJoinBackward(purchases, clicks,
          key = "user_id", leftTs = "pts", rightTs = "cts",
          rightPayload = Seq("click_id", "click_ts"))
        .select(col("event_id"), col("user_id"), col("pts"),
          when(fresh, col("click_id")).as("feat_click_id"),
          when(fresh, col("pts") - col("click_ts")).as("staleness_us"),
          fresh.as("within_tolerance"))
        .orderBy("event_id")
    },
    Some("""WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS pts
           |           FROM events WHERE event_type = 'purchase'),
           |c AS (SELECT event_id AS click_id, user_id, epoch_us(ts) AS cts
           |      FROM events WHERE event_type = 'click')
           |SELECT event_id, p.user_id AS user_id, pts,
           |  CASE WHEN cts IS NOT NULL AND pts - cts <= 21600000000
           |    THEN click_id END AS feat_click_id,
           |  CASE WHEN cts IS NOT NULL AND pts - cts <= 21600000000
           |    THEN pts - cts END AS staleness_us,
           |  COALESCE(cts IS NOT NULL AND pts - cts <= 21600000000, FALSE)
           |    AS within_tolerance
           |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.pts >= c.cts
           |ORDER BY event_id""".stripMargin))

  private val asofForward = Q(
    "q_asof_forward",
    (s, dir) => {
      // mirror of q_asof_join: for each purchase, the NEXT click (>= ts)
      val ev = events(s, dir).withColumn("ts_us", expr("ts DIV 1000"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_us").as("pts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_us").as("cts"),
          col("event_id").as("click_id"), col("ts_us").as("click_ts"))
      TimeOps.asofJoinForward(purchases, clicks,
        key = "user_id", leftTs = "pts", rightTs = "cts",
        rightPayload = Seq("click_id", "click_ts"))
        .orderBy("event_id")
    },
    Some("""WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS pts
           |           FROM events WHERE event_type = 'purchase'),
           |c AS (SELECT event_id AS click_id, user_id, epoch_us(ts) AS cts
           |      FROM events WHERE event_type = 'click')
           |SELECT p.event_id, p.user_id, p.pts, c.click_id, c.cts AS click_ts
           |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.pts <= c.cts
           |ORDER BY p.event_id""".stripMargin))

  private val eventsSessions = Q(
    "q_events_sessions",
    (s, dir) =>
      TimeOps.sessionize(
        events(s, dir).select(col("user_id"), expr("ts DIV 1000").as("ts_us")),
        key = "user_id", tsCol = "ts_us", gap = 1800000000L) // 30 min in µs
        .orderBy("user_id", "session_id"),
    Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS tsn FROM events),
           |g AS (SELECT user_id, tsn,
           |        CASE WHEN lag(tsn) OVER w IS NULL
           |                  OR tsn - lag(tsn) OVER w > 1800000000
           |             THEN 1 ELSE 0 END AS is_new
           |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsn)),
           |s AS (SELECT user_id, tsn,
           |        CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY tsn
           |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
           |      FROM g)
           |SELECT user_id, session_id, COUNT(*) AS n_events,
           |  MIN(tsn) AS start_ts, MAX(tsn) AS end_ts
           |FROM s GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin))

  // HLL sketch implementations differ across engines — bench/rows-only
  private val eventsSliding = Q(
    "q_events_sliding",
    (s, dir) => {
      // SLIDING event-time windows (1h window, 15min slide): each event
      // lands in exactly 4 overlapping windows — the batch twin of a
      // streaming sliding aggregation. The oracle reproduces Spark's
      // window assignment by exploding k=0..3 slide offsets.
      val ev = events(s, dir)
        .withColumn("ts_t", timestamp_micros(expr("ts DIV 1000")))
      ev.groupBy(window(col("ts_t"), "1 hour", "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum6(col("value")).as("sum_value"))
        .select(
          unix_micros(col("window.start")).as("win_us"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("win_us", "event_type")
    },
    Some(s"""SELECT win_us, event_type, COUNT(*) AS n, ${oSum6("value")} AS sum_value
            |FROM (SELECT (epoch_us(ts) // 900000000 - k.i) * 900000000 AS win_us,
            |        event_type, value
            |      FROM events
            |      CROSS JOIN (SELECT unnest(range(4)) AS i) k)
            |GROUP BY 1, 2 ORDER BY win_us, event_type""".stripMargin))

  private val eventsFunnel = Q(
    "q_events_funnel",
    (s, dir) => {
      // ordered funnel signup → view → purchase: each stage's first
      // timestamp must follow the previous stage's. Three conditional
      // min-aggregations chained by key joins — every shuffle is on
      // user_id, output is one row of stage counts.
      val ev = events(s, dir)
        .select(col("user_id"), expr("ts DIV 1000").as("t"), col("event_type"))
      val sStage = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(col("t")).as("s_ts"))
      val vStage = ev.filter(col("event_type") === "view")
        .join(sStage, "user_id").filter(col("t") >= col("s_ts"))
        .groupBy("user_id").agg(min(col("t")).as("v_ts"))
      val pStage = ev.filter(col("event_type") === "purchase")
        .join(vStage, "user_id").filter(col("t") >= col("v_ts"))
        .groupBy("user_id").agg(min(col("t")).as("p_ts"))
      sStage.agg(count(lit(1)).as("n_signup"))
        .crossJoin(vStage.agg(count(lit(1)).as("n_view")))
        .crossJoin(pStage.agg(count(lit(1)).as("n_purchase")))
    },
    Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_type FROM events),
           |s AS (SELECT user_id, MIN(t) AS s_ts FROM e WHERE event_type = 'signup' GROUP BY 1),
           |v AS (SELECT e.user_id, MIN(t) AS v_ts FROM e JOIN s USING (user_id)
           |      WHERE event_type = 'view' AND t >= s_ts GROUP BY 1),
           |p AS (SELECT e.user_id, MIN(t) AS p_ts FROM e JOIN v USING (user_id)
           |      WHERE event_type = 'purchase' AND t >= v_ts GROUP BY 1)
           |SELECT (SELECT COUNT(*) FROM s) AS n_signup,
           |       (SELECT COUNT(*) FROM v) AS n_view,
           |       (SELECT COUNT(*) FROM p) AS n_purchase""".stripMargin))

  // Funnel conversion rates with WILSON 95% intervals — the score
  // interval a growth dashboard should show instead of ±1.96·√(pq/n)
  // (Wald collapses at small n / extreme p). Every input is an exact
  // integer stage count; z and z² are pinned double literals rendered
  // into BOTH plans from the same Scala value, and the interval is one
  // pinned IEEE tree per stage (sqrt is correctly rounded everywhere).
  private val funnelWilson = Q(
    "q_funnel_wilson",
    (s, dir) => {
      val z = 1.96
      val zz = z * z
      val ev = events(s, dir)
        .select(col("user_id"), expr("ts DIV 1000").as("t"), col("event_type"))
      val sStage = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(col("t")).as("s_ts"))
      val vStage = ev.filter(col("event_type") === "view")
        .join(sStage, "user_id").filter(col("t") >= col("s_ts"))
        .groupBy("user_id").agg(min(col("t")).as("v_ts"))
      val pStage = ev.filter(col("event_type") === "purchase")
        .join(vStage, "user_id").filter(col("t") >= col("v_ts"))
        .groupBy("user_id").agg(min(col("t")).as("p_ts"))
      val counts = sStage.agg(count(lit(1)).as("n_signup"))
        .crossJoin(vStage.agg(count(lit(1)).as("n_view")))
        .crossJoin(pStage.agg(count(lit(1)).as("n_purchase")))
      val stages = counts.select(lit("1_view_given_signup").as("stage"),
          col("n_signup").as("n_prev"), col("n_view").as("n_conv"))
        .unionAll(counts.select(lit("2_purchase_given_view").as("stage"),
          col("n_view").as("n_prev"), col("n_purchase").as("n_conv")))
      val p = col("n_conv").cast("double") / col("n_prev")
      val nD = col("n_prev").cast("double")
      val denom = lit(1.0) + lit(zz) / nD
      val center = (p + lit(zz) / (lit(2.0) * nD)) / denom
      val half = lit(z) * sqrt(p * (lit(1.0) - p) / nD
        + lit(zz) / (lit(4.0) * nD * nD)) / denom
      stages.select(col("stage"), col("n_prev"), col("n_conv"),
          round(p, 9).as("p_hat"),
          round(center - half, 9).as("wilson_lo"),
          round(center + half, 9).as("wilson_hi"))
        .orderBy("stage")
    },
    Some {
      val z = 1.96
      val zz = z * z
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_type FROM events),
         |s AS (SELECT user_id, MIN(t) AS s_ts FROM e WHERE event_type = 'signup' GROUP BY 1),
         |v AS (SELECT e.user_id, MIN(t) AS v_ts FROM e JOIN s USING (user_id)
         |      WHERE event_type = 'view' AND t >= s_ts GROUP BY 1),
         |p AS (SELECT e.user_id, MIN(t) AS p_ts FROM e JOIN v USING (user_id)
         |      WHERE event_type = 'purchase' AND t >= v_ts GROUP BY 1),
         |counts AS (
         |  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s) AS n_signup,
         |         (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_view,
         |         (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_purchase),
         |stages AS (
         |  SELECT '1_view_given_signup' AS stage, n_signup AS n_prev, n_view AS n_conv
         |  FROM counts
         |  UNION ALL
         |  SELECT '2_purchase_given_view', n_view, n_purchase FROM counts),
         |w AS (
         |  SELECT stage, n_prev, n_conv,
         |    CAST(n_conv AS DOUBLE) / n_prev AS p,
         |    CAST(n_prev AS DOUBLE) AS nd
         |  FROM stages)
         |SELECT stage, n_prev, n_conv, round(p, 9) AS p_hat,
         |  round((p + $zz / (2.0::DOUBLE * nd)) / (1.0::DOUBLE + $zz / nd)
         |    - $z * sqrt(p * (1.0::DOUBLE - p) / nd + $zz / (4.0::DOUBLE * nd * nd))
         |      / (1.0::DOUBLE + $zz / nd), 9) AS wilson_lo,
         |  round((p + $zz / (2.0::DOUBLE * nd)) / (1.0::DOUBLE + $zz / nd)
         |    + $z * sqrt(p * (1.0::DOUBLE - p) / nd + $zz / (4.0::DOUBLE * nd * nd))
         |      / (1.0::DOUBLE + $zz / nd), 9) AS wilson_hi
         |FROM w ORDER BY stage""".stripMargin
    })

  // Cohort LTV curves: cumulative purchase revenue per user by
  // months-since-signup, one curve per signup-month cohort — the
  // retention matrix's revenue twin. Revenue goes through the exact
  // DECIMAL(28,6) sum contract; the cumulative window is partitioned by
  // COHORT and ordered by months-since (both calendar-bounded), and the
  // per-user division is the final pinned IEEE op.
  private val cohortLtv = Q(
    "q_cohort_ltv",
    (s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val ev = events(s, dir)
        .select(col("user_id"), col("event_type"), col("value"),
          expr("CAST(year(date_add(DATE '1970-01-01', CAST(ts DIV 86400000000000 AS INT))) * 12 "
            + "+ month(date_add(DATE '1970-01-01', CAST(ts DIV 86400000000000 AS INT))) AS BIGINT)")
            .as("midx"))
      val cohort = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(col("midx")).as("c0"))
      val sizes = cohort.groupBy("c0").agg(count(lit(1)).as("n_users"))
      val rev = ev.filter(col("event_type") === "purchase")
        .join(cohort, "user_id")
        .filter(col("midx") >= col("c0"))
        .groupBy(col("c0"), (col("midx") - col("c0")).as("months_since"))
        .agg(sum(col("value").cast(DecimalType(28, 6))).as("rev"))
      val w = W.partitionBy("c0").orderBy("months_since")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
      rev.withColumn("cum", sum(col("rev")).over(w))
        .join(broadcast(sizes), "c0")
        .select(col("c0").as("cohort_month"), col("months_since"), col("n_users"),
          round(col("cum").cast("double") / col("n_users"), 6).as("ltv_per_user"))
        .orderBy("cohort_month", "months_since")
    },
    Some("""WITH ev AS (
           |  SELECT user_id, event_type, value,
           |    CAST(year(DATE '1970-01-01' + CAST(epoch_ns(ts) // 86400000000000 AS INTEGER)) * 12
           |      + month(DATE '1970-01-01' + CAST(epoch_ns(ts) // 86400000000000 AS INTEGER)) AS BIGINT) AS midx
           |  FROM events),
           |cohort AS (SELECT user_id, MIN(midx) AS c0 FROM ev
           |           WHERE event_type = 'signup' GROUP BY 1),
           |sizes AS (SELECT c0, CAST(COUNT(*) AS BIGINT) AS n_users FROM cohort GROUP BY 1),
           |rev AS (
           |  SELECT c0, midx - c0 AS months_since,
           |    SUM(CAST(value AS DECIMAL(28,6))) AS rev
           |  FROM ev JOIN cohort USING (user_id)
           |  WHERE event_type = 'purchase' AND midx >= c0
           |  GROUP BY 1, 2),
           |cum AS (
           |  SELECT c0, months_since,
           |    SUM(rev) OVER (PARTITION BY c0 ORDER BY months_since
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           |  FROM rev)
           |SELECT c0 AS cohort_month, months_since, n_users,
           |  round(CAST(cum AS DOUBLE) / n_users, 6) AS ltv_per_user
           |FROM cum JOIN sizes USING (c0)
           |ORDER BY cohort_month, months_since""".stripMargin))

  private val variantExtract = Q(
    "q_variant_extract",
    (s, dir) =>
      // Spark 4 VARIANT path: parse once into the binary variant encoding,
      // then typed variant_get extraction — the modern semi-structured
      // column representation (vs per-access string re-parsing in
      // q_json_extract's get_json_object)
      events(s, dir)
        .select(col("event_id"), parse_json(col("props")).as("v"))
        .select(col("event_id"),
          variant_get(col("v"), "$.k", "int").as("k"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"))
        .orderBy("k"),
    Some("""SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
           |  COUNT(*) AS n
           |FROM events GROUP BY 1 ORDER BY k NULLS FIRST""".stripMargin))

  private val eventsSessionWindow = Q(
    "q_events_sessionwin",
    (s, dir) => {
      // the BUILT-IN session_window aggregation (vs ops/TimeOps.sessionize,
      // the hand-rolled island-detection twin that also has a streaming
      // form): gap-close after 30 min, session end = last event + gap
      val ev = events(s, dir)
        .select(col("user_id"),
          timestamp_micros(expr("ts DIV 1000")).as("ts_t"))
      ev.groupBy(col("user_id"), session_window(col("ts_t"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("s_start"),
          unix_micros(col("session_window.end")).as("s_end"),
          col("n_events"))
        .orderBy("user_id", "s_start")
    },
    Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),
           |x AS (SELECT user_id, t,
           |        CASE WHEN lag(t) OVER w IS NULL
           |               OR t - lag(t) OVER w > 1800000000
           |             THEN 1 ELSE 0 END AS brk
           |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)),
           |g AS (SELECT user_id, t,
           |        SUM(brk) OVER (PARTITION BY user_id ORDER BY t
           |          ROWS UNBOUNDED PRECEDING) AS sid
           |      FROM x)
           |SELECT user_id, MIN(t) AS s_start,
           |  MAX(t) + 1800000000 AS s_end,
           |  COUNT(*) AS n_events
           |FROM g GROUP BY user_id, sid
           |ORDER BY user_id, s_start""".stripMargin))

  private val eventSequences = Q(
    "q_events_sequences",
    (s, dir) => {
      // Per-user behavior sequence: event types concatenated in time order
      // — the "event log → training example" assembly shape. collect_list
      // is order-nondeterministic, so collect (t, event_id, type) structs
      // and array_sort them (lexicographic struct order ≡ ORDER BY t,
      // event_id; event_id is unique so the order is total) before
      // projecting the types out. One shuffle on user_id; per-group state
      // is that user's events, the same bound as any session assembly.
      val ev = events(s, dir)
        .select(col("user_id"), expr("ts DIV 1000").as("t"),
          col("event_id"), col("event_type"))
      ev.groupBy("user_id")
        .agg(
          count(lit(1)).as("n_events"),
          array_join(
            transform(
              array_sort(collect_list(
                struct(col("t"), col("event_id"), col("event_type")))),
              x => x.getField("event_type")),
            ">").as("sequence"))
        .orderBy("user_id")
    },
    Some("""SELECT user_id, COUNT(*) AS n_events,
           |  string_agg(event_type, '>' ORDER BY epoch_us(ts), event_id)
           |    AS sequence
           |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin))

  // HLL++ estimate next to the exact count. The raw estimate is
  // engine-specific (HLL registers aren't portable), so the DRIVER-vis
  // output carries only portable columns: the group keys, the exact
  // count, and `approx_ok` — the 5%-relative-error assertion computed
  // from the estimate. The oracle reproduces keys + exact count and
  // asserts the bound as literal TRUE, so rows/schema/hash all check;
  // estimate ACCURACY itself stays pinned by ApproxDistinctSpec.
  private val approxDistinct = Q(
    "q_approx_distinct",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          approx_count_distinct(col("l_partkey")).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("approx_parts") - col("exact_parts"))
            <= col("exact_parts") * 0.05).as("approx_ok"))
        .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
           |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           |  TRUE AS approx_ok
           |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin))

  // Recursive CTE (Spark 4 WITH RECURSIVE): walk the +5 key chain inside
  // each region's nation block — linear recursion resolved by the engine's
  // iterative union, same construct on both engines.
  private val recursiveCte = Q(
    "q_recursive_cte",
    (s, dir) => {
      t(s, dir, "nation").createOrReplaceTempView("nation_v")
      s.sql("""WITH RECURSIVE chain(nkey, depth) AS (
              |  SELECT n_nationkey, 0 FROM nation_v WHERE n_nationkey < 5
              |  UNION ALL
              |  SELECT c.nkey + 5, c.depth + 1 FROM chain c WHERE c.nkey + 5 < 25
              |)
              |SELECT c.nkey, c.depth, n.n_name
              |FROM chain c JOIN nation_v n ON n.n_nationkey = c.nkey
              |ORDER BY nkey, depth""".stripMargin)
    },
    Some("""WITH RECURSIVE chain(nkey, depth) AS (
           |  SELECT n_nationkey, 0 FROM nation WHERE n_nationkey < 5
           |  UNION ALL
           |  SELECT c.nkey + 5, c.depth + 1 FROM chain c WHERE c.nkey + 5 < 25
           |)
           |SELECT c.nkey, c.depth, n.n_name
           |FROM chain c JOIN nation n ON n.n_nationkey = c.nkey
           |ORDER BY nkey, depth""".stripMargin))

  // LATERAL correlated subquery: per-customer top-2 orders by price —
  // the "apply" join shape (per-row dependent subplan) both engines
  // de-correlate into a ranked join.
  private val lateralTop2 = Q(
    "q_lateral",
    (s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer_v")
      t(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql("""SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
              |FROM customer_v c,
              |LATERAL (SELECT o_orderkey, o_totalprice FROM orders_v
              |         WHERE o_custkey = c.c_custkey
              |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
              |WHERE c.c_custkey <= 200
              |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin)
    },
    Some("""SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
           |FROM customer c,
           |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
           |         WHERE o_custkey = c.c_custkey
           |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
           |WHERE c.c_custkey <= 200
           |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin))

  // Time-weighted average: each event's value holds until the next event
  // of the same type (step-function semantics — sensor readings, prices,
  // feature-flag states). Weights are exact integer microseconds, the
  // value·duration products are exact decimals, so the one double
  // division at the end is deterministic with no rounding.
  private val twap = Q(
    "q_twap",
    (s, dir) => {
      val ev = events(s, dir).select(col("event_type"),
        expr("ts DIV 1000").as("t"), col("event_id"),
        col("value").cast(DecimalType(18, 6)).as("v"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("t", "event_id")
      ev.withColumn("dur", lead(col("t"), 1).over(w) - col("t"))
        .groupBy("event_type")
        .agg(count(col("dur")).as("n_intervals"),
          sum(col("dur")).as("total_us"),
          round(sum(col("v") * col("dur")).cast(DoubleType)
            / sum(col("dur")).cast(DoubleType), 9).as("twap"))
        .orderBy("event_type")
    },
    Some("""WITH e AS (
           |  SELECT event_type, epoch_us(ts) AS t, event_id,
           |         CAST(value AS DECIMAL(18,6)) AS v
           |  FROM events),
           |d AS (
           |  SELECT event_type, v,
           |    lead(t) OVER (PARTITION BY event_type ORDER BY t, event_id) - t AS dur
           |  FROM e)
           |SELECT event_type, COUNT(dur) AS n_intervals,
           |  CAST(SUM(dur) AS BIGINT) AS total_us,
           |  round(CAST(SUM(v * dur) AS DOUBLE) / CAST(SUM(dur) AS DOUBLE), 9) AS twap
           |FROM d GROUP BY 1 ORDER BY event_type""".stripMargin))

  // User lifecycle accounting: each active month classifies a user as
  // new / retained / resurrected, and the month AFTER a user's last
  // active month records a churn. The four curves every growth dashboard
  // plots, from one distinct user-month frame + one lag/lead window.
  private val userLifecycle = Q(
    "q_user_lifecycle",
    (s, dir) => {
      val um = events(s, dir)
        .select(col("user_id"),
          date_trunc("month", timestamp_micros(expr("ts DIV 1000")))
            .cast("date").as("m"))
        .distinct()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("m")
      val withNeighbors = um
        .withColumn("prev", lag(col("m"), 1).over(w))
        .withColumn("next", lead(col("m"), 1).over(w))
      val active = withNeighbors.select(col("m"),
        when(col("prev").isNull, lit("new"))
          .when(add_months(col("prev"), 1) === col("m"), lit("retained"))
          .otherwise(lit("resurrected")).as("status"))
      val churned = withNeighbors
        .filter(col("next").isNull || col("next") > add_months(col("m"), 1))
        .select(add_months(col("m"), 1).as("m"), lit("churned").as("status"))
      active.unionAll(churned)
        .groupBy("m", "status").agg(count(lit(1)).as("n_users"))
        .orderBy("m", "status")
    },
    Some("""WITH um AS (
           |  SELECT DISTINCT user_id,
           |    CAST(date_trunc('month', ts) AS DATE) AS m
           |  FROM events),
           |nb AS (
           |  SELECT user_id, m,
           |    lag(m) OVER (PARTITION BY user_id ORDER BY m) AS prev,
           |    lead(m) OVER (PARTITION BY user_id ORDER BY m) AS next
           |  FROM um),
           |active AS (
           |  SELECT m,
           |    CASE WHEN prev IS NULL THEN 'new'
           |         WHEN CAST(prev + INTERVAL 1 MONTH AS DATE) = m THEN 'retained'
           |         ELSE 'resurrected' END AS status
           |  FROM nb),
           |churned AS (
           |  SELECT CAST(m + INTERVAL 1 MONTH AS DATE) AS m, 'churned' AS status
           |  FROM nb
           |  WHERE next IS NULL OR next > CAST(m + INTERVAL 1 MONTH AS DATE))
           |SELECT m, status, COUNT(*) AS n_users
           |FROM (SELECT * FROM active UNION ALL SELECT * FROM churned)
           |GROUP BY 1, 2 ORDER BY m, status""".stripMargin))

  // Trailing-window COUNT DISTINCT (7-day active users per day). The
  // naive form is a days×events range join — O(|days|·|events|) and a
  // nested loop. The scale rewrite: distinct (user, day) pairs once, then
  // each pair explodes to the ≤7 days it is visible in, and a plain
  // grouped distinct count per visible day finishes — shuffle is 7× the
  // distinct-pair count, never days×events. Oracle = the naive range
  // join, so the hash match proves the rewrite invisible.
  private val rollingDistinct = Q(
    "q_rolling_distinct",
    (s, dir) => {
      val ud = events(s, dir)
        .select(col("user_id"), expr("ts DIV 86400000000000").as("day"))
        .distinct()
      val vis = ud.select(col("user_id"),
        explode(sequence(col("day"), col("day") + 6)).as("day_vis"))
      val actual = ud.select(col("day").as("day_vis")).distinct()
      vis.groupBy("day_vis").agg(countDistinct("user_id").as("active_7d"))
        .join(actual, Seq("day_vis"), "left_semi")
        .withColumnRenamed("day_vis", "day")
        .orderBy("day")
    },
    Some("""WITH ud AS (
           |  SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day
           |  FROM events),
           |days AS (SELECT DISTINCT day FROM ud)
           |SELECT d.day, COUNT(DISTINCT u.user_id) AS active_7d
           |FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
           |GROUP BY d.day ORDER BY d.day""".stripMargin))

  // Trending: top-3 event types per day by TRAILING-7-DAY volume — the
  // rolling-distinct rewrite plus a rank: daily counts explode to the ≤7
  // days they are visible in, re-aggregate, rank within day. Shuffle is
  // 7×|day×type| rows, never days×events.
  private val trendingTopk = Q(
    "q_trending",
    (s, dir) => {
      val daily = events(s, dir)
        .groupBy(expr("ts DIV 86400000000000").as("day"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      val vis = daily.select(col("event_type"), col("cnt"),
        explode(sequence(col("day"), col("day") + 6)).as("day_vis"))
        .groupBy("day_vis", "event_type").agg(sum(col("cnt")).as("n7"))
      val actual = daily.select(col("day").as("day_vis")).distinct()
      val w = org.apache.spark.sql.expressions.Window.partitionBy("day_vis")
        .orderBy(col("n7").desc, col("event_type"))
      vis.join(actual, Seq("day_vis"), "left_semi")
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("day_vis").as("day"), col("rnk").cast("int").as("rnk"),
          col("event_type"), col("n7"))
        .orderBy("day", "rnk")
    },
    Some("""WITH daily AS (
           |  SELECT epoch_ns(ts) // 86400000000000 AS day, event_type, COUNT(*) AS cnt
           |  FROM events GROUP BY 1, 2),
           |days AS (SELECT DISTINCT day FROM daily)
           |SELECT day, rnk, event_type, n7 FROM (
           |  SELECT d.day, u.event_type, CAST(SUM(u.cnt) AS BIGINT) AS n7,
           |    CAST(row_number() OVER (PARTITION BY d.day
           |      ORDER BY SUM(u.cnt) DESC, u.event_type) AS INTEGER) AS rnk
           |  FROM days d JOIN daily u ON u.day BETWEEN d.day - 6 AND d.day
           |  GROUP BY d.day, u.event_type)
           |WHERE rnk <= 3 ORDER BY day, rnk""".stripMargin))

  // Chi-square independence test (order priority × order status):
  // observed counts exact, expected = row·col/n in doubles, per-cell
  // terms 9dp-rounded then exact-decimal summed (the q_entropy contract
  // for order-independent transcendental/NONLINEAR aggregates).
  // Recency-weighted popularity: per event type, trailing 8-day count
  // with half-per-day exponential decay. Decay 1/2 (not 0.9) is a DESIGN
  // choice for determinism: every weight 2^-k is an exact dyadic, so the
  // weighted sum is computed as an exact INTEGER sum of cnt·2^(7-k) and
  // one final division by 128 — order-independent, no libm pow anywhere.
  // Shuffle is |day×type| daily counts, never events; the max-day scalar
  // broadcasts. The ranking-feed "decayed counter" shape, feasible at
  // any corpus size because state is one integer per (type, day).
  private val decayedCounts = Q(
    "q_decayed_counts",
    (s, dir) => {
      val daily = events(s, dir)
        .groupBy(expr("ts DIV 86400000000000").as("day"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      val mx = daily.agg(max("day").as("maxday"))
      daily.crossJoin(broadcast(mx))
        .withColumn("k", (col("maxday") - col("day")).cast("int"))
        .filter(col("k") <= 7)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          (sum(expr("cnt * shiftleft(CAST(1 AS BIGINT), 7 - k)")).cast("double")
            / lit(128.0)).as("decayed"))
        .orderBy("event_type")
    },
    Some("""WITH daily AS (
           |  SELECT epoch_ns(ts) // 86400000000000 AS day, event_type, COUNT(*) AS cnt
           |  FROM events GROUP BY 1, 2),
           |mx AS (SELECT MAX(day) AS maxday FROM daily)
           |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
           |  CAST(SUM(cnt * (1 << CAST(7 - (maxday - day) AS INTEGER))) AS DOUBLE)
           |    / 128.0 AS decayed
           |FROM daily, mx WHERE maxday - day <= 7
           |GROUP BY event_type ORDER BY event_type""".stripMargin))

  private val chiSquare = Q(
    "q_chi2",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val cells = o.groupBy("o_orderpriority", "o_orderstatus")
        .agg(count(lit(1)).as("obs"))
      val rows = cells.groupBy("o_orderpriority").agg(sum(col("obs")).as("r"))
      val cols_ = cells.groupBy("o_orderstatus").agg(sum(col("obs")).as("c"))
      val n = cells.agg(sum(col("obs")).as("n"))
      val e = col("r").cast("double") * col("c").cast("double") / col("n").cast("double")
      val term = round((col("obs") - e) * (col("obs") - e) / e, 9)
      cells.join(rows, "o_orderpriority").join(cols_, "o_orderstatus")
        .crossJoin(broadcast(n))
        .agg(
          sum(term.cast(DecimalType(28, 12))).cast("double").as("chi2"),
          ((countDistinct(col("o_orderpriority")) - 1)
            * (countDistinct(col("o_orderstatus")) - 1)).as("dof"))
    },
    Some("""WITH cells AS (
           |  SELECT o_orderpriority, o_orderstatus, COUNT(*) AS obs
           |  FROM orders GROUP BY 1, 2),
           |r AS (SELECT o_orderpriority, SUM(obs) AS r FROM cells GROUP BY 1),
           |c AS (SELECT o_orderstatus, SUM(obs) AS c FROM cells GROUP BY 1),
           |n AS (SELECT SUM(obs) AS n FROM cells),
           |terms AS (
           |  SELECT cells.o_orderpriority, cells.o_orderstatus, obs,
           |    round((obs - CAST(r AS DOUBLE)*CAST(c AS DOUBLE)/CAST(n AS DOUBLE))
           |        * (obs - CAST(r AS DOUBLE)*CAST(c AS DOUBLE)/CAST(n AS DOUBLE))
           |        / (CAST(r AS DOUBLE)*CAST(c AS DOUBLE)/CAST(n AS DOUBLE)), 9) AS term
           |  FROM cells JOIN r USING (o_orderpriority) JOIN c USING (o_orderstatus)
           |  CROSS JOIN n)
           |SELECT CAST(SUM(CAST(term AS DECIMAL(28,12))) AS DOUBLE) AS chi2,
           |  (COUNT(DISTINCT o_orderpriority) - 1)
           |    * (COUNT(DISTINCT o_orderstatus) - 1) AS dof
           |FROM terms""".stripMargin))

  // Spearman rank correlation (quantity vs price per return flag) on
  // tie-AVERAGED ranks, kept integral as double-ranks r2 = 2·rank + ties
  // − 1 (Spearman is affine-invariant, so scaling ranks by 2 changes
  // nothing and keeps every moment sum an exact integer). All sums ride
  // DECIMAL(38,0) (DuckDB: HUGEINT); only the final num/√(dx·dy) is
  // IEEE, cut at 9 dp on both engines.
  private val rankCorr = Q(
    "q_rank_corr",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val W = org.apache.spark.sql.expressions.Window
      def r2(c: String) =
        (lit(2) * rank().over(
            W.partitionBy("l_returnflag").orderBy(col(c)))
          + count(lit(1)).over(W.partitionBy("l_returnflag", c))
          - 1).cast(DecimalType(14, 0))
      val ranked = li.select(col("l_returnflag"),
        r2("l_quantity").as("rx"), r2("l_extendedprice").as("ry"))
      val d38 = DecimalType(38, 0)
      val agg = ranked.groupBy("l_returnflag").agg(
        count(lit(1)).cast(d38).as("n"),
        sum(col("rx")).cast(d38).as("sx"),
        sum(col("ry")).cast(d38).as("sy"),
        sum((col("rx") * col("ry")).cast(DecimalType(28, 0))).cast(d38).as("sxy"),
        sum((col("rx") * col("rx")).cast(DecimalType(28, 0))).cast(d38).as("sxx"),
        sum((col("ry") * col("ry")).cast(DecimalType(28, 0))).cast(d38).as("syy"))
      agg.select(col("l_returnflag"), col("n").cast("long").as("n"),
          round((col("n") * col("sxy") - col("sx") * col("sy")).cast(DoubleType)
            / sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast(DoubleType)
              * (col("n") * col("syy") - col("sy") * col("sy")).cast(DoubleType)), 9)
            .as("spearman_rho"))
        .orderBy("l_returnflag")
    },
    Some("""WITH ranked AS (
           |  SELECT l_returnflag,
           |    CAST(2 * rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
           |      + count(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1
           |      AS HUGEINT) AS rx,
           |    CAST(2 * rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
           |      + count(*) OVER (PARTITION BY l_returnflag, l_extendedprice) - 1
           |      AS HUGEINT) AS ry
           |  FROM lineitem),
           |m AS (
           |  SELECT l_returnflag, CAST(COUNT(*) AS HUGEINT) AS n,
           |    SUM(rx) AS sx, SUM(ry) AS sy,
           |    SUM(rx * ry) AS sxy, SUM(rx * rx) AS sxx, SUM(ry * ry) AS syy
           |  FROM ranked GROUP BY 1)
           |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           |  round(CAST(n * sxy - sx * sy AS DOUBLE)
           |    / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
           |         * CAST(n * syy - sy * sy AS DOUBLE)), 9) AS spearman_rho
           |FROM m ORDER BY l_returnflag""".stripMargin))

  // Benford first-digit profile of order totals — the forensic
  // data-quality screen. The leading digit comes from the CENTS INTEGER
  // rendered as a string (double→string formatting is engine-specific;
  // bigint→string is canonical), so the digit extraction is exact;
  // expected share log10(1+1/d) and the observed share are 9dp-rounded
  // IEEE on both engines.
  private val benford = Q(
    "q_benford",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val cents = round(col("o_totalprice") * 100).cast("long")
      val digit = substring(cents.cast("string"), 1, 1).cast("int")
      val counts = o.select(digit.as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n"))
      val total = counts.agg(sum(col("n")).as("total"))
      counts.crossJoin(broadcast(total))
        .select(col("digit"), col("n"),
          round(col("n").cast(DoubleType) / col("total").cast(DoubleType), 9)
            .as("share"),
          round(log10(lit(1.0) + lit(1.0) / col("digit").cast(DoubleType)), 9)
            .as("benford_share"))
        .orderBy("digit")
    },
    Some("""WITH d AS (
           |  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT)
           |      AS VARCHAR), 1, 1) AS INTEGER) AS digit
           |  FROM orders),
           |counts AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY 1),
           |t AS (SELECT SUM(n) AS total FROM counts)
           |SELECT digit, n,
           |  round(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 9) AS share,
           |  round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 9) AS benford_share
           |FROM counts CROSS JOIN t ORDER BY digit""".stripMargin))

  val all: Seq[Q] = Seq(
    groupingSets, joinRight, nullSafeEq, sqlEntry, jsonExtract,
    asofJoin, asofNative, asofForward, pitJoin, eventsSessions, eventsSliding, eventsFunnel, funnelWilson, cohortLtv,
    eventSequences, variantExtract, eventsSessionWindow, approxDistinct,
    recursiveCte, lateralTop2, twap, userLifecycle, rollingDistinct,
    trendingTopk, decayedCounts, chiSquare, rankCorr, benford)
}
