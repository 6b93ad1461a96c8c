package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{ApproxDistinct, IncrementalAgg, Layout, Merge, TimeOps}
import QueryUtil._

/**
 * Curated-zone maintenance + time-series wave: MERGE upsert/delete, SCD
 * Type-2 history, Z-order layout keys, EWMA, anomaly flagging, higher
 * moments, cross join. These are the operations a warehouse-shaped
 * pipeline (the reference's curated layer, SURVEY §2.1 O17-O19) runs
 * between ingest and serving; change batches are synthesized
 * DETERMINISTICALLY from the fixtures so a DuckDB oracle reproduces every
 * output bit-for-bit.
 */
object Maintenance {

  // ---- shared synthetic change-batch shapes (Spark + SQL kept in ONE
  // place so the merge/diff queries cannot drift): %100 keys get a
  // segment rewrite; %250 keys spawn inserts under NEGATED keys —
  // -(k)-1 can never collide with a real (non-negative) key at ANY
  // fixture scale, where a fixed "+1000000" offset eventually would.
  private def custBase(s: org.apache.spark.sql.SparkSession, dir: String) =
    t(s, dir, "customer").select("c_custkey", "c_name", "c_mktsegment")

  private def modsOf(cust: org.apache.spark.sql.DataFrame) =
    cust.filter(col("c_custkey") % 100 === 0)
      .withColumn("c_mktsegment", lit("UPDATED"))

  private def newsOf(cust: org.apache.spark.sql.DataFrame) =
    cust.filter(col("c_custkey") % 250 === 0).select(
      (-col("c_custkey") - 1).as("c_custkey"),
      concat(lit("NEW-"), col("c_name")).as("c_name"),
      lit("FRESH").as("c_mktsegment"))

  private val baseSql = "SELECT c_custkey, c_name, c_mktsegment FROM customer"
  private val modsSql =
    "SELECT c_custkey, c_name, 'UPDATED' AS c_mktsegment FROM base WHERE c_custkey % 100 = 0"
  private val newsSql =
    """SELECT -c_custkey - 1 AS c_custkey, 'NEW-' || c_name AS c_name,
      |       'FRESH' AS c_mktsegment FROM base WHERE c_custkey % 250 = 0""".stripMargin

  // MERGE upsert: customers ending in 00 get a new segment, every 250th
  // key (negated, collision-proof) is a fresh insert — the
  // daily-change-batch ingest shape folded into the previous snapshot.
  private val mergeUpsert = Q(
    "q_merge_upsert",
    (s, dir) => {
      val cust = custBase(s, dir)
      Merge.upsert(cust, modsOf(cust).unionByName(newsOf(cust)), "c_custkey")
        .orderBy("c_custkey")
    },
    Some(s"""WITH base AS ($baseSql),
            |mods AS ($modsSql),
            |news AS ($newsSql),
            |upd AS (SELECT * FROM mods UNION ALL SELECT * FROM news)
            |SELECT * FROM (
            |  SELECT b.* FROM base b
            |  WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.c_custkey = b.c_custkey)
            |  UNION ALL SELECT * FROM upd)
            |ORDER BY c_custkey""".stripMargin))

  // MERGE delete: tombstone every 10th key (the right-to-erasure shape).
  private val mergeDelete = Q(
    "q_merge_delete",
    (s, dir) => {
      val cust = t(s, dir, "customer").select("c_custkey", "c_name", "c_mktsegment")
      val tombstones = cust.filter(col("c_custkey") % 10 === 0).select("c_custkey")
      Merge.deleteMatching(cust, tombstones, "c_custkey").orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
           |WHERE c_custkey % 10 <> 0 ORDER BY c_custkey""".stripMargin))

  // SCD2: a versioned dimension (current snapshot + some pre-existing
  // history) folds in a change batch at t=100 — closed rows, new versions,
  // first versions for unseen keys, history untouched. The dimension
  // builder is shared with q_scd2_lookup, which consumes the versions.
  private def scd2Dim(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val cust = t(s, dir, "customer").select("c_custkey", "c_mktsegment")
    val cur0 = cust
      .withColumn("valid_from", lit(0L))
      .withColumn("valid_to", lit(null).cast("long"))
      .withColumn("is_current", lit(true))
    val hist0 = cust.filter(col("c_custkey") % 50 === 0)
      .withColumn("c_mktsegment", lit("LEGACY"))
      .withColumn("valid_from", lit(-100L))
      .withColumn("valid_to", lit(0L))
      .withColumn("is_current", lit(false))
    val changes = cust.filter(col("c_custkey") % 40 === 0)
      .withColumn("c_mktsegment", lit("MOVED"))
      .unionByName(cust.filter(col("c_custkey") % 70 === 0).select(
        (-col("c_custkey") - 1).as("c_custkey"),
        lit("BORN").as("c_mktsegment")))
    Merge.scd2Apply(cur0.unionByName(hist0), changes,
      "c_custkey", Seq("c_mktsegment"), batchTs = 100L)
  }

  // the versioned-dimension CTE chain, shared by both SCD2 oracles
  private val scd2DimSql =
    """WITH base AS (SELECT c_custkey, c_mktsegment FROM customer),
           |cur0 AS (SELECT c_custkey, c_mktsegment, CAST(0 AS BIGINT) AS valid_from,
           |                CAST(NULL AS BIGINT) AS valid_to, TRUE AS is_current FROM base),
           |hist0 AS (SELECT c_custkey, 'LEGACY', CAST(-100 AS BIGINT), CAST(0 AS BIGINT), FALSE
           |          FROM base WHERE c_custkey % 50 = 0),
           |dim AS (SELECT * FROM cur0 UNION ALL SELECT * FROM hist0),
           |changes AS (SELECT c_custkey, 'MOVED' AS seg FROM base WHERE c_custkey % 40 = 0
           |            UNION ALL
           |            SELECT -c_custkey - 1, 'BORN' FROM base WHERE c_custkey % 70 = 0),
           |cur AS (SELECT * FROM dim WHERE is_current),
           |hist AS (SELECT * FROM dim WHERE NOT is_current),
           |changed AS (SELECT c.c_custkey, ch.seg FROM cur c
           |            JOIN changes ch USING (c_custkey)
           |            WHERE c.c_mktsegment IS DISTINCT FROM ch.seg),
           |untouched AS (SELECT c.* FROM cur c
           |              WHERE NOT EXISTS (SELECT 1 FROM changed x WHERE x.c_custkey = c.c_custkey)),
           |closed AS (SELECT c.c_custkey, c.c_mktsegment, c.valid_from,
           |                  CAST(100 AS BIGINT) AS valid_to, FALSE AS is_current
           |           FROM cur c JOIN changed x USING (c_custkey)),
           |newkeys AS (SELECT ch.c_custkey, ch.seg FROM changes ch
           |            WHERE NOT EXISTS (SELECT 1 FROM cur c WHERE c.c_custkey = ch.c_custkey)),
           |inserts AS (SELECT c_custkey, seg AS c_mktsegment, CAST(100 AS BIGINT) AS valid_from,
           |                   CAST(NULL AS BIGINT) AS valid_to, TRUE AS is_current
           |            FROM (SELECT * FROM changed UNION ALL SELECT * FROM newkeys)),
           |dim2 AS (SELECT * FROM hist UNION ALL SELECT * FROM untouched
           |         UNION ALL SELECT * FROM closed UNION ALL SELECT * FROM inserts)""".stripMargin

  private val scd2 = Q(
    "q_scd2",
    (s, dir) => scd2Dim(s, dir).orderBy("c_custkey", "valid_from", "is_current"),
    Some(scd2DimSql +
      "\nSELECT * FROM dim2 ORDER BY c_custkey, valid_from, is_current"))

  // Point-in-time lookup against the versioned dimension: each fact joins
  // the ONE version valid at its timestamp (the reason SCD2 exists). Key
  // equality drives the shuffle; the validity range is a post-join filter.
  private val scd2Lookup = Q(
    "q_scd2_lookup",
    (s, dir) => {
      val dim = scd2Dim(s, dir)
      val facts = t(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey"),
        (col("o_orderkey") % 300 - 50).cast("long").as("fact_ts"))
      facts.join(dim,
        facts("o_custkey") === dim("c_custkey") &&
          dim("valid_from") <= facts("fact_ts") &&
          (dim("valid_to").isNull || facts("fact_ts") < dim("valid_to")))
        .select("o_orderkey", "o_custkey", "fact_ts", "c_mktsegment")
        .orderBy("o_orderkey")
    },
    Some(scd2DimSql + """
           |, facts AS (SELECT o_orderkey, o_custkey,
           |              CAST(o_orderkey % 300 - 50 AS BIGINT) AS fact_ts FROM orders)
           |SELECT f.o_orderkey, f.o_custkey, f.fact_ts, d.c_mktsegment
           |FROM facts f JOIN dim2 d
           |  ON f.o_custkey = d.c_custkey
           | AND d.valid_from <= f.fact_ts
           | AND (d.valid_to IS NULL OR f.fact_ts < d.valid_to)
           |ORDER BY f.o_orderkey""".stripMargin))

  // Z-order layout key: Morton-interleave (p_partkey, p_size) — the
  // multi-dimensional clustering sort key, bit-reproducible in SQL.
  private val zorder = Q(
    "q_zorder_key",
    (s, dir) =>
      t(s, dir, "part").select(
        col("p_partkey"), col("p_size"),
        Layout.mortonKey(col("p_partkey"), col("p_size"), 16).as("zkey"))
        .orderBy("zkey", "p_partkey"),
    Some(s"""SELECT p_partkey, p_size, ${Layout.mortonKeySql("p_partkey", "p_size", 16)} AS zkey
            |FROM part ORDER BY zkey, p_partkey""".stripMargin))

  // EWMA of event values per user (α=0.3) — the sequential recurrence,
  // deterministic via (ts, event_id) sort and left-to-right folds on both
  // engines (DuckDB list_reduce seeds with the first element, so the
  // Spark fold seeds identically and folds the tail).
  private val ewmaQ = Q(
    "q_ewma",
    (s, dir) =>
      TimeOps.ewma(events(s, dir), "user_id", "ts", "value",
        alpha = 0.3, tieBreak = "event_id")
        .orderBy("user_id"),
    Some("""SELECT user_id, n, round(list_reduce(vals, (a, b) -> 0.3 * b + 0.7 * a), 9) AS ewma
           |FROM (SELECT user_id, CAST(len(list(value)) AS BIGINT) AS n,
           |             list(value ORDER BY ts, event_id) AS vals
           |      FROM events GROUP BY user_id)
           |ORDER BY user_id""".stripMargin))

  // Daily-count anomaly flags per event type: |z| > 1.5 vs the type's own
  // daily distribution. Counts are integers, so Σc and Σc² are exact and
  // the z formula is the same IEEE sequence on both engines.
  private val eventsAnomaly = Q(
    "q_events_anomaly",
    (s, dir) => {
      val daily = events(s, dir)
        .groupBy(col("event_type"), expr("ts DIV 86400000000000").as("day"))
        .agg(count(lit(1)).as("cnt"))
      val n = count(lit(1))
      val s1 = sum(col("cnt"))
      val s2 = sum(col("cnt") * col("cnt"))
      val stats = daily.groupBy("event_type").agg(
        n.as("n_days"), s1.as("s1"), s2.as("s2"))
      val mean = col("s1").cast("double") / col("n_days")
      val variance = col("s2").cast("double") / col("n_days") - mean * mean
      daily.join(stats, "event_type")
        .withColumn("z", round((col("cnt") - mean) / sqrt(variance), 9))
        .filter(abs(col("z")) > 1.5)
        .select("event_type", "day", "cnt", "z")
        .orderBy("event_type", "day")
    },
    Some("""WITH daily AS (
           |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day, COUNT(*) AS cnt
           |  FROM events GROUP BY 1, 2),
           |stats AS (
           |  SELECT event_type, COUNT(*) AS n_days, SUM(cnt) AS s1, SUM(cnt * cnt) AS s2
           |  FROM daily GROUP BY event_type)
           |SELECT event_type, day, cnt,
           |       round((cnt - CAST(s1 AS DOUBLE) / n_days) /
           |             sqrt(CAST(s2 AS DOUBLE) / n_days -
           |                  (CAST(s1 AS DOUBLE) / n_days) * (CAST(s1 AS DOUBLE) / n_days)), 9) AS z
           |FROM daily JOIN stats USING (event_type)
           |WHERE abs((cnt - CAST(s1 AS DOUBLE) / n_days) /
           |          sqrt(CAST(s2 AS DOUBLE) / n_days -
           |               (CAST(s1 AS DOUBLE) / n_days) * (CAST(s1 AS DOUBLE) / n_days))) > 1.5
           |ORDER BY event_type, day""".stripMargin))

  // Skewness/kurtosis from exact integer power sums (l_quantity is
  // integer-valued, so Σq..Σq⁴ are exact longs — order-independent and
  // engine-portable), then one identical double formula per engine
  // (sqrt(v)*v instead of pow(v,1.5): sqrt is correctly rounded
  // everywhere, libm pow is not).
  private val statsMoments = Q(
    "q_stats_moments",
    (s, dir) => {
      val x = col("l_quantity").cast("long")
      val agg = t(s, dir, "lineitem").groupBy("l_returnflag").agg(
        count(lit(1)).as("n"),
        sum(x).cast("double").as("s1"),
        sum(x * x).cast("double").as("s2"),
        sum(x * x * x).cast("double").as("s3"),
        sum(x * x * x * x).cast("double").as("s4"))
      val n = col("n").cast("double")
      val m1 = col("s1") / n
      val m2 = col("s2") / n - m1 * m1
      val m3 = col("s3") / n - lit(3.0) * m1 * (col("s2") / n) + lit(2.0) * m1 * m1 * m1
      val m4 = col("s4") / n - lit(4.0) * m1 * (col("s3") / n) +
        lit(6.0) * m1 * m1 * (col("s2") / n) - lit(3.0) * m1 * m1 * m1 * m1
      agg.select(
        col("l_returnflag"), col("n"),
        round(m1, 9).as("mean"),
        round(m3 / (sqrt(m2) * m2), 9).as("skewness"),
        round(m4 / (m2 * m2) - lit(3.0), 9).as("kurtosis"))
        .orderBy("l_returnflag")
    },
    Some("""WITH sums AS (
           |  SELECT l_returnflag, COUNT(*) AS n,
           |    CAST(SUM(x) AS DOUBLE) AS s1, CAST(SUM(x*x) AS DOUBLE) AS s2,
           |    CAST(SUM(x*x*x) AS DOUBLE) AS s3, CAST(SUM(x*x*x*x) AS DOUBLE) AS s4
           |  FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x FROM lineitem)
           |  GROUP BY l_returnflag)
           |SELECT l_returnflag, n,
           |  round(s1/n, 9) AS mean,
           |  round((s3/n - 3.0*(s1/n)*(s2/n) + 2.0*(s1/n)*(s1/n)*(s1/n)) /
           |        (sqrt(s2/n - (s1/n)*(s1/n)) * (s2/n - (s1/n)*(s1/n))), 9) AS skewness,
           |  round((s4/n - 4.0*(s1/n)*(s3/n) + 6.0*(s1/n)*(s1/n)*(s2/n)
           |         - 3.0*(s1/n)*(s1/n)*(s1/n)*(s1/n)) /
           |        ((s2/n - (s1/n)*(s1/n)) * (s2/n - (s1/n)*(s1/n))) - 3.0, 9) AS kurtosis
           |FROM sums ORDER BY l_returnflag""".stripMargin))

  // Cross join (cartesian): the one join type not yet in the inventory —
  // region × region distance grid.
  private val crossJoin = Q(
    "q_cross_join",
    (s, dir) => {
      val r1 = t(s, dir, "region").select(
        col("r_regionkey").as("k1"), col("r_name").as("n1"))
      val r2 = t(s, dir, "region").select(
        col("r_regionkey").as("k2"), col("r_name").as("n2"))
      r1.crossJoin(r2)
        .select(col("k1"), col("k2"),
          concat(col("n1"), lit("->"), col("n2")).as("route"))
        .orderBy("k1", "k2")
    },
    Some("""SELECT a.r_regionkey AS k1, b.r_regionkey AS k2,
           |       a.r_name || '->' || b.r_name AS route
           |FROM region a CROSS JOIN region b ORDER BY k1, k2""".stripMargin))

  // Incremental rollup maintenance: state from pre-1997 orders, 1997+
  // folded in as the delta — the oracle is the FULL recompute, so the
  // hash match proves ⊕-merge refresh ≡ rebuild, bit for bit.
  private val incrRollup = Q(
    "q_incr_rollup",
    (s, dir) => {
      val orders = t(s, dir, "orders")
      val keys = Seq("o_orderstatus", "o_orderpriority")
      val hist = orders.filter(col("o_orderdate") < lit("1997-01-01"))
      val delta = orders.filter(col("o_orderdate") >= lit("1997-01-01"))
      val state = IncrementalAgg.buildState(hist, keys, "o_totalprice")
      val refreshed = IncrementalAgg.refresh(state, delta, keys, "o_totalprice")
      IncrementalAgg.serve(refreshed, keys)
        .orderBy("o_orderstatus", "o_orderpriority")
    },
    Some("""SELECT o_orderstatus, o_orderpriority,
           |  COUNT(o_totalprice) AS cnt,
           |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_v,
           |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) / COUNT(o_totalprice) AS avg_v,
           |  MIN(o_totalprice) AS min_v, MAX(o_totalprice) AS max_v
           |FROM orders GROUP BY 1, 2
           |ORDER BY o_orderstatus, o_orderpriority""".stripMargin))

  // TPC-H Q2 shape: correlated scalar-min subquery (argmin join) —
  // Catalyst decorrelates into an aggregate + join; DuckDB does the same.
  private val argminSupplier = Q(
    "q_argmin_supplier",
    (s, dir) => {
      t(s, dir, "part").createOrReplaceTempView("part_v")
      t(s, dir, "supplier").createOrReplaceTempView("supplier_v")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
      s.sql("""SELECT p.p_partkey, s.s_name, l.l_extendedprice AS best_price,
              |       l.l_orderkey, l.l_linenumber
              |FROM part_v p
              |JOIN lineitem_v l ON l.l_partkey = p.p_partkey
              |JOIN supplier_v s ON l.l_suppkey = s.s_suppkey
              |WHERE p.p_size >= 45
              |  AND l.l_extendedprice = (SELECT min(l2.l_extendedprice)
              |                           FROM lineitem_v l2
              |                           WHERE l2.l_partkey = p.p_partkey)
              |ORDER BY p_partkey, s_name, l_orderkey, l_linenumber, best_price""".stripMargin)
    },
    Some("""SELECT p.p_partkey, s.s_name, l.l_extendedprice AS best_price,
           |       l.l_orderkey, l.l_linenumber
           |FROM part p
           |JOIN lineitem l ON l.l_partkey = p.p_partkey
           |JOIN supplier s ON l.l_suppkey = s.s_suppkey
           |WHERE p.p_size >= 45
           |  AND l.l_extendedprice = (SELECT min(l2.l_extendedprice)
           |                           FROM lineitem l2
           |                           WHERE l2.l_partkey = p.p_partkey)
           |ORDER BY p_partkey, s_name, l_orderkey, l_linenumber, best_price""".stripMargin))

  // Time-series resampling: daily grid per order status (sequence explode)
  // left-joined to observed revenue, gaps forward-filled with a running
  // last(ignoreNulls) window — the resample→ffill pipeline every
  // time-series mart runs after ingest.
  private val resampleFfill = Q(
    "q_resample_ffill",
    (s, dir) => {
      val orders = t(s, dir, "orders")
      val daily = orders
        .groupBy(col("o_orderstatus"), to_date(col("o_orderdate")).as("day"))
        .agg(dsum(col("o_totalprice")).as("rev"))
      val bounds = orders.agg(
        to_date(min(col("o_orderdate"))).as("lo"),
        to_date(max(col("o_orderdate"))).as("hi"))
      val grid = orders.select("o_orderstatus").distinct()
        .crossJoin(bounds)
        .select(col("o_orderstatus"),
          explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
      val w = Window.partitionBy("o_orderstatus").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(daily, Seq("o_orderstatus", "day"), "left")
        .withColumn("rev_ffill",
          coalesce(last(col("rev"), ignoreNulls = true).over(w), lit(0.0)))
        .withColumn("observed", col("rev").isNotNull)
        .select("o_orderstatus", "day", "rev_ffill", "observed")
        .orderBy("o_orderstatus", "day")
    },
    Some(s"""WITH daily AS (
            |  SELECT o_orderstatus, CAST(o_orderdate AS DATE) AS day,
            |         ${oSum("o_totalprice")} AS rev
            |  FROM orders GROUP BY 1, 2),
            |bounds AS (
            |  SELECT CAST(MIN(o_orderdate) AS DATE) AS lo,
            |         CAST(MAX(o_orderdate) AS DATE) AS hi FROM orders),
            |grid AS (
            |  SELECT s.o_orderstatus,
            |         CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
            |  FROM (SELECT DISTINCT o_orderstatus FROM orders) s CROSS JOIN bounds)
            |SELECT g.o_orderstatus, g.day,
            |  coalesce(last_value(d.rev IGNORE NULLS) OVER (
            |    PARTITION BY g.o_orderstatus ORDER BY g.day
            |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS rev_ffill,
            |  d.rev IS NOT NULL AS observed
            |FROM grid g LEFT JOIN daily d
            |  ON d.o_orderstatus = g.o_orderstatus AND d.day = g.day
            |ORDER BY g.o_orderstatus, g.day""".stripMargin))

  // Three-valued-logic torture: NOT IN against a subquery list is only
  // TRUE when no member matches AND the list is null-free — one NULL makes
  // every non-member UNKNOWN, so the withnull branch returns nothing once
  // a >450k order exists. Both engines must agree branch by branch.
  private val notInNull = Q(
    "q_not_in_null",
    (s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer_v")
      t(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql("""SELECT 'nullfree' AS variant, c_custkey FROM customer_v
              |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders_v
              |                        WHERE o_totalprice > 400000 AND o_custkey IS NOT NULL)
              |UNION ALL
              |SELECT 'withnull' AS variant, c_custkey FROM customer_v
              |WHERE c_custkey NOT IN (SELECT CASE WHEN o_totalprice > 450000 THEN NULL
              |                                    ELSE o_custkey END
              |                        FROM orders_v WHERE o_totalprice > 400000)
              |ORDER BY variant, c_custkey""".stripMargin)
    },
    Some("""SELECT 'nullfree' AS variant, c_custkey FROM customer
           |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
           |                        WHERE o_totalprice > 400000 AND o_custkey IS NOT NULL)
           |UNION ALL
           |SELECT 'withnull' AS variant, c_custkey FROM customer
           |WHERE c_custkey NOT IN (SELECT CASE WHEN o_totalprice > 450000 THEN NULL
           |                                    ELSE o_custkey END
           |                        FROM orders WHERE o_totalprice > 400000)
           |ORDER BY variant, c_custkey""".stripMargin))

  // Mergeable HLL sketch state: distinct users per event type, state
  // built from half the log and refreshed with the other half — serving
  // estimates identical to a single-pass build (union = register max).
  // Sketch registers aren't portable across engines, so the driver-visible
  // columns are the keys + exact distinct + `est_ok`, the 5%-relative-
  // error assertion on the served estimate; the oracle recomputes the
  // exact count and asserts the bound TRUE (estimate determinism and
  // refresh≡rebuild stay pinned by ApproxDistinctSpec).
  private val distinctSketch = Q(
    "q_distinct_sketch",
    (s, dir) => {
      val ev = events(s, dir)
      val keys = Seq("event_type")
      val hist = ev.filter(col("event_id") % 2 === 0)
      val delta = ev.filter(col("event_id") % 2 =!= 0)
      val state = ApproxDistinct.buildState(hist, keys, "user_id")
      val served = ApproxDistinct.serve(
        ApproxDistinct.refresh(state, delta, keys, "user_id"), keys)
      val exact = ev.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact_users"))
      served.join(exact, "event_type")
        .select(col("event_type"), col("exact_users"),
          (abs(col("approx_distinct") - col("exact_users"))
            <= col("exact_users") * 0.05).as("est_ok"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type,
           |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           |  TRUE AS est_ok
           |FROM events GROUP BY 1 ORDER BY 1""".stripMargin))

  // Distributed constraint validation: the reference's validate stage as
  // a queryable violations table — min-rows floor, not-null, unique key
  // (lineitem's composite key HAS real duplicates in the fixture),
  // referential integrity by anti join, value range. violations = 0 ⇔
  // pass; the oracle recomputes every rule in SQL.
  private val constraintsQ = Q(
    "q_constraints",
    (s, dir) => {
      import graft.validate.Constraints._
      val orders = t(s, dir, "orders")
      val customer = t(s, dir, "customer")
      val li = t(s, dir, "lineitem")
      checkAll(Seq(
        minRows(orders, "orders_min_rows_100", 100L),
        notNull(orders, "orders_custkey_not_null", "o_custkey"),
        uniqueKey(orders, "orders_pk_unique", Seq("o_orderkey")),
        uniqueKey(li, "lineitem_pk_unique", Seq("l_orderkey", "l_linenumber")),
        foreignKey(orders, "orders_fk_customer", "o_custkey", customer, "c_custkey"),
        inRange(li, "lineitem_qty_range_1_50", "l_quantity", 1.0, 50.0),
        // accepted-values + format checks — the reference README's
        // remaining validate-stage rule kinds; the enum deliberately
        // EXCLUDES 'P' so a real nonzero count is exercised
        inEnum(orders, "orders_status_enum_F_O", "o_orderstatus", Seq("F", "O")),
        matchesRegex(customer, "customer_name_format", "c_name",
          "Customer#[0-9]{9}")))
    },
    Some("""SELECT rule, CAST(violations AS BIGINT) AS violations FROM (
           |  SELECT 'orders_min_rows_100' AS rule,
           |         GREATEST(0, 100 - COUNT(*)) AS violations FROM orders
           |  UNION ALL
           |  SELECT 'orders_custkey_not_null',
           |         SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) FROM orders
           |  UNION ALL
           |  SELECT 'orders_pk_unique',
           |         COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders
           |  UNION ALL
           |  SELECT 'lineitem_pk_unique',
           |         COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber)) FROM lineitem
           |  UNION ALL
           |  SELECT 'orders_fk_customer', COUNT(*) FROM orders o
           |  WHERE o.o_custkey IS NOT NULL
           |    AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
           |  UNION ALL
           |  SELECT 'lineitem_qty_range_1_50',
           |         SUM(CASE WHEN l_quantity IS NOT NULL
           |                   AND (l_quantity < 1 OR l_quantity > 50)
           |                  THEN 1 ELSE 0 END) FROM lineitem
           |  UNION ALL
           |  SELECT 'orders_status_enum_F_O',
           |         SUM(CASE WHEN o_orderstatus IS NOT NULL
           |                   AND o_orderstatus NOT IN ('F', 'O')
           |                  THEN 1 ELSE 0 END) FROM orders
           |  UNION ALL
           |  SELECT 'customer_name_format',
           |         SUM(CASE WHEN c_name IS NOT NULL
           |                   AND NOT regexp_full_match(c_name, 'Customer#[0-9]{9}')
           |                  THEN 1 ELSE 0 END) FROM customer)
           |ORDER BY rule""".stripMargin))

  // Resample by LINEAR INTERPOLATION: thin the daily series to weekly
  // anchor points, then reconstruct every day between its surrounding
  // anchors — the compress-and-reconstruct shape (downsampled storage,
  // full-resolution serving). prev/next anchors arrive via running
  // last/first(ignoreNulls) windows — one sort per key, no self-join;
  // days outside the anchor range stay null by NULL arithmetic.
  private val resampleLerp = Q(
    "q_resample_lerp",
    (s, dir) => {
      val orders = t(s, dir, "orders")
      val daily = orders
        .groupBy(col("o_orderstatus"), to_date(col("o_orderdate")).as("day"))
        .agg(dsum(col("o_totalprice")).as("rev"))
      val anchors = daily
        .filter(datediff(col("day"), lit("1970-01-01")) % 7 === 0)
      val bounds = orders.agg(
        to_date(min(col("o_orderdate"))).as("lo"),
        to_date(max(col("o_orderdate"))).as("hi"))
      val grid = orders.select("o_orderstatus").distinct()
        .crossJoin(bounds)
        .select(col("o_orderstatus"),
          explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
      val d = datediff(col("day"), lit("1970-01-01")).cast("double")
      val wB = Window.partitionBy("o_orderstatus").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wF = Window.partitionBy("o_orderstatus").orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val joined = grid.join(anchors, Seq("o_orderstatus", "day"), "left")
        .withColumn("pv", last(col("rev"), ignoreNulls = true).over(wB))
        .withColumn("pd", last(when(col("rev").isNotNull, d), ignoreNulls = true).over(wB))
        .withColumn("nv", first(col("rev"), ignoreNulls = true).over(wF))
        .withColumn("nd", first(when(col("rev").isNotNull, d), ignoreNulls = true).over(wF))
      joined.select(col("o_orderstatus"), col("day"),
        when(col("pd") === col("nd"), col("pv"))
          .otherwise(col("pv") + (col("nv") - col("pv"))
            * ((d - col("pd")) / (col("nd") - col("pd")))).as("rev_lerp"))
        .orderBy("o_orderstatus", "day")
    },
    Some(s"""WITH daily AS (
            |  SELECT o_orderstatus, CAST(o_orderdate AS DATE) AS day,
            |         ${oSum("o_totalprice")} AS rev
            |  FROM orders GROUP BY 1, 2),
            |anchors AS (
            |  SELECT * FROM daily
            |  WHERE date_diff('day', DATE '1970-01-01', day) % 7 = 0),
            |bounds AS (
            |  SELECT CAST(MIN(o_orderdate) AS DATE) AS lo,
            |         CAST(MAX(o_orderdate) AS DATE) AS hi FROM orders),
            |grid AS (
            |  SELECT s.o_orderstatus, g.day
            |  FROM (SELECT DISTINCT o_orderstatus FROM orders) s
            |  CROSS JOIN (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
            |              FROM bounds) g),
            |marked AS (
            |  SELECT g.o_orderstatus, g.day, a.rev,
            |    CAST(date_diff('day', DATE '1970-01-01', g.day) AS DOUBLE) AS d
            |  FROM grid g LEFT JOIN anchors a
            |    ON g.o_orderstatus = a.o_orderstatus AND g.day = a.day),
            |wind AS (
            |  SELECT o_orderstatus, day, d,
            |    last_value(rev IGNORE NULLS) OVER wb AS pv,
            |    last_value(CASE WHEN rev IS NOT NULL THEN d END IGNORE NULLS) OVER wb AS pd,
            |    first_value(rev IGNORE NULLS) OVER wf AS nv,
            |    first_value(CASE WHEN rev IS NOT NULL THEN d END IGNORE NULLS) OVER wf AS nd
            |  FROM marked
            |  WINDOW
            |    wb AS (PARTITION BY o_orderstatus ORDER BY day
            |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
            |    wf AS (PARTITION BY o_orderstatus ORDER BY day
            |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
            |SELECT o_orderstatus, day,
            |  CASE WHEN pd = nd THEN pv
            |       ELSE pv + (nv - pv) * ((d - pd) / (nd - pd)) END AS rev_lerp
            |FROM wind ORDER BY o_orderstatus, day""".stripMargin))

  // KMV k-minimum-values sketch: the PORTABLE approximate distinct.
  // The engine builds state on two disjoint halves of lineitem, merges
  // the states (pure set column op), and serves (k−1)·2⁶⁰/h_k — while
  // the oracle computes the estimate in ONE pass over all rows in SQL.
  // The hash match therefore proves, in the correctness gate itself, the
  // property DataSketches HLL lacks: split-refresh ≡ rebuild bit-exactly
  // AND the estimate is engine-portable.
  // ONE single-pass oracle shared by the split-merge and rollup KMV
  // queries — both engine paths must serve exactly this
  private val kmvOracle =
    """WITH h AS (
      |  SELECT DISTINCT l_returnflag,
      |    ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))::BIGINT AS hv
      |  FROM lineitem),
      |r AS (
      |  SELECT l_returnflag, hv,
      |    row_number() OVER (PARTITION BY l_returnflag ORDER BY hv) AS rn,
      |    count(*) OVER (PARTITION BY l_returnflag) AS nd
      |  FROM h)
      |SELECT l_returnflag,
      |  CAST(LEAST(nd, 256) AS INTEGER) AS n_kept,
      |  CASE WHEN nd < 256 THEN CAST(nd AS DOUBLE)
      |       ELSE 255.0 * 1152921504606846976.0 / CAST(hv AS DOUBLE) END AS est_distinct
      |FROM r
      |WHERE rn = LEAST(nd, 256)
      |ORDER BY l_returnflag""".stripMargin

  private val kmvDistinct = Q(
    "q_kmv_distinct",
    (s, dir) => {
      val k = 256 // ONE k for build, merge, and the state's kmv_k
      val li = t(s, dir, "lineitem")
      val keys = Seq("l_returnflag")
      val hist = li.filter(col("l_linenumber") % 2 === 0)
      val delta = li.filter(col("l_linenumber") % 2 =!= 0)
      val merged = ApproxDistinct.kmvBuildState(hist, keys, "l_orderkey", k)
        .select(col("l_returnflag"), col("kmv").as("ka"))
        .join(ApproxDistinct.kmvBuildState(delta, keys, "l_orderkey", k)
          .select(col("l_returnflag"), col("kmv").as("kb")), keys, "full_outer")
        .select(col("l_returnflag"), ApproxDistinct.kmvMerge(
          coalesce(col("ka"), array().cast("array<bigint>")),
          coalesce(col("kb"), array().cast("array<bigint>")), k).as("kmv"),
          lit(k).as("kmv_k"))
      ApproxDistinct.kmvServe(merged, keys).orderBy("l_returnflag")
    },
    Some(kmvOracle))

  // KMV ROLLUP: states built at (returnflag, linestatus), rolled up to
  // returnflag by exploding member hashes and re-taking the k smallest —
  // no data rescan. The oracle is the SAME single-pass query as
  // q_kmv_distinct: the hash match proves rollup ≡ direct build, the
  // set-semantics property that makes sketch state tables cheap to
  // re-aggregate at any granularity.
  private val kmvRollupQ = Q(
    "q_kmv_rollup",
    (s, dir) => {
      val fine = ApproxDistinct.kmvBuildState(t(s, dir, "lineitem"),
        Seq("l_returnflag", "l_linestatus"), "l_orderkey", 256)
      ApproxDistinct.kmvServe(
        ApproxDistinct.kmvRollup(fine, Seq("l_returnflag"), 256),
        Seq("l_returnflag")).orderBy("l_returnflag")
    },
    Some(kmvOracle))

  // KMV SET OPERATIONS (Beyer et al., SIGMOD'07): |A∪B|, Jaccard, |A∩B|
  // for the R-flag and A-flag order-key sets, served from the two
  // sketches alone — the "how much do these segments overlap" question a
  // sketch state table answers without rescanning 100 TB. The oracle
  // rebuilds the same md5 sketches in SQL; every estimator step is one
  // IEEE op, so the APPROXIMATE answers hash-match bit-for-bit.
  private val kmvSetOpsQ = Q(
    "q_kmv_setops",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val a = ApproxDistinct.kmvBuildState(
        li.filter(col("l_returnflag") === "R"), Nil, "l_orderkey", 256)
      val b = ApproxDistinct.kmvBuildState(
        li.filter(col("l_returnflag") === "A"), Nil, "l_orderkey", 256)
      ApproxDistinct.kmvSetOps(a, b, Nil, 256)
    },
    Some("""WITH sa AS (
           |  SELECT DISTINCT ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))::BIGINT AS hv
           |  FROM lineitem WHERE l_returnflag = 'R' ORDER BY hv LIMIT 256),
           |sb AS (
           |  SELECT DISTINCT ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))::BIGINT AS hv
           |  FROM lineitem WHERE l_returnflag = 'A' ORDER BY hv LIMIT 256),
           |u AS (SELECT hv FROM (SELECT hv FROM sa UNION SELECT hv FROM sb)
           |      ORDER BY hv LIMIT 256),
           |st AS (SELECT count(*) AS nk, max(hv) AS hk FROM u),
           |ib AS (SELECT count(*) AS ni FROM u
           |       WHERE hv IN (SELECT hv FROM sa) AND hv IN (SELECT hv FROM sb))
           |SELECT CAST(nk AS INTEGER) AS n_kept,
           |  CASE WHEN nk < 256 THEN CAST(nk AS DOUBLE)
           |       ELSE 255.0 * 1152921504606846976.0 / CAST(hk AS DOUBLE) END AS est_union,
           |  CAST(ni AS DOUBLE) / CAST(nk AS DOUBLE) AS jaccard,
           |  (CAST(ni AS DOUBLE) / CAST(nk AS DOUBLE)) *
           |    (CASE WHEN nk < 256 THEN CAST(nk AS DOUBLE)
           |          ELSE 255.0 * 1152921504606846976.0 / CAST(hk AS DOUBLE) END)
           |    AS est_intersection
           |FROM st, ib""".stripMargin))

  // Exact distinct users per event type via mergeable bitmaps — the
  // bitmap union is exact, so unlike the HLL sketch this hash-matches a
  // plain COUNT(DISTINCT) oracle while shuffling bitmaps, not values.
  private val bitmapDistinct = Q(
    "q_bitmap_distinct",
    (s, dir) =>
      ApproxDistinct.exactDistinctBitmap(events(s, dir), Seq("event_type"), "user_id")
        .orderBy("event_type"),
    Some("""SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
           |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))

  // OLS regression (price on quantity per return flag) from exact decimal
  // sums Σx Σy Σxy Σx² — order-independent inputs, one identical IEEE
  // formula per engine, 9 dp cut.
  private val regression = Q(
    "q_regr",
    (s, dir) => {
      val x = col("l_quantity").cast("decimal(18,6)")
      val y = col("l_extendedprice").cast("decimal(18,2)")
      val agg = t(s, dir, "lineitem").groupBy("l_returnflag").agg(
        count(lit(1)).as("n"),
        sum(x).cast("double").as("sx"),
        sum(y).cast("double").as("sy"),
        sum((x * y).cast("decimal(28,6)")).cast("double").as("sxy"),
        sum((x * x).cast("decimal(28,6)")).cast("double").as("sxx"))
      val n = col("n").cast("double")
      val slope = (col("sxy") - col("sx") * col("sy") / n) /
        (col("sxx") - col("sx") * col("sx") / n)
      agg.select(
        col("l_returnflag"), col("n"),
        round(slope, 9).as("slope"),
        round(col("sy") / n - slope * (col("sx") / n), 9).as("intercept"))
        .orderBy("l_returnflag")
    },
    Some("""WITH sums AS (
           |  SELECT l_returnflag, COUNT(*) AS n,
           |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
           |    CAST(SUM(CAST(x*y AS DECIMAL(28,6))) AS DOUBLE) AS sxy,
           |    CAST(SUM(CAST(x*x AS DECIMAL(28,6))) AS DOUBLE) AS sxx
           |  FROM (SELECT l_returnflag, CAST(l_quantity AS DECIMAL(18,6)) AS x,
           |               CAST(l_extendedprice AS DECIMAL(18,2)) AS y FROM lineitem)
           |  GROUP BY l_returnflag)
           |SELECT l_returnflag, n,
           |  round((sxy - sx*sy/n) / (sxx - sx*sx/n), 9) AS slope,
           |  round(sy/n - ((sxy - sx*sy/n) / (sxx - sx*sx/n)) * (sx/n), 9) AS intercept
           |FROM sums ORDER BY l_returnflag""".stripMargin))

  // Winsorization: clip a numeric feature at its group's exact P5/P95
  // (percentile ≡ quantile_cont bit-exactly, the q_median precedent) —
  // the outlier-taming step before numeric features feed a model. The
  // per-group bounds broadcast back; clipping is map-side.
  // NEAREST-RANK bounds, not interpolated quantiles: an interpolated P5
  // is a full-precision double whose DECIMAL(18,2) rounding can differ
  // between engines at representation boundaries; the rank-⌈p·n⌉ element
  // is an actual 2-dp money value, so the clipped sum stays dsum-exact.
  // Rank positions come from the same ceil(p·n) double math both engines.
  private val winsorize = Q(
    "q_winsorize",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
      val ranked = li
        .withColumn("rn", row_number().over(w))
        .withColumn("nr", count(lit(1)).over(Window.partitionBy("l_returnflag")))
      val bounds = ranked.groupBy("l_returnflag").agg(
        max(when(col("rn") === ceil(lit(0.05) * col("nr")), col("l_extendedprice"))).as("lo"),
        max(when(col("rn") === ceil(lit(0.95) * col("nr")), col("l_extendedprice"))).as("hi"))
      li.join(broadcast(bounds), "l_returnflag")
        .withColumn("clipped",
          least(greatest(col("l_extendedprice"), col("lo")), col("hi")))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          dsum(col("clipped")).as("sum_clipped"),
          sum(when(col("l_extendedprice") < col("lo"), 1L)
            .when(col("l_extendedprice") > col("hi"), 1L)
            .otherwise(0L)).as("n_clipped"))
        .orderBy("l_returnflag")
    },
    Some(s"""WITH ranked AS (
            |  SELECT l_returnflag, l_extendedprice,
            |    row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
            |    COUNT(*) OVER (PARTITION BY l_returnflag) AS nr
            |  FROM lineitem),
            |bounds AS (
            |  SELECT l_returnflag,
            |    MAX(CASE WHEN rn = ceil(0.05 * nr) THEN l_extendedprice END) AS lo,
            |    MAX(CASE WHEN rn = ceil(0.95 * nr) THEN l_extendedprice END) AS hi
            |  FROM ranked GROUP BY 1)
            |SELECT l_returnflag, COUNT(*) AS n,
            |  ${oSum("least(greatest(l_extendedprice, lo), hi)")} AS sum_clipped,
            |  CAST(SUM(CASE WHEN l_extendedprice < lo THEN 1
            |           WHEN l_extendedprice > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
            |FROM lineitem JOIN bounds USING (l_returnflag)
            |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  // arg-extremum aggregates: per status, WHICH order is largest/smallest
  // (max_by/min_by ≡ DuckDB arg_max/arg_min), deterministic because
  // o_totalprice ties are broken inside the comparator struct.
  private val argExtremum = Q(
    "q_argmax",
    (s, dir) =>
      t(s, dir, "orders").groupBy("o_orderstatus").agg(
        max_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey"))).as("biggest_order"),
        min_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey"))).as("smallest_order"),
        max(col("o_totalprice")).as("max_price"))
        .orderBy("o_orderstatus"),
    Some("""SELECT o_orderstatus,
           |  MAX(CASE WHEN rn_desc = 1 THEN o_orderkey END) AS biggest_order,
           |  MAX(CASE WHEN rn_asc = 1 THEN o_orderkey END) AS smallest_order,
           |  MAX(o_totalprice) AS max_price
           |FROM (SELECT o_orderstatus, o_orderkey, o_totalprice,
           |        row_number() OVER (PARTITION BY o_orderstatus
           |          ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn_desc,
           |        row_number() OVER (PARTITION BY o_orderstatus
           |          ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn_asc
           |      FROM orders)
           |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin))

  // Changelog generation: diff two deterministic snapshots of customer
  // (new = segment rewrite on %100 keys + %250 inserts + %9 deletes) into
  // I/U/D change records — the CDC feed downstream consumers replay.
  private val snapshotDiff = Q(
    "q_snapshot_diff",
    (s, dir) => {
      val cust = t(s, dir, "customer").select("c_custkey", "c_name", "c_mktsegment")
      val newSnap = cust.filter(col("c_custkey") % 9 =!= 0)
        .withColumn("c_mktsegment",
          when(col("c_custkey") % 100 === 0, lit("UPDATED")).otherwise(col("c_mktsegment")))
        .unionByName(newsOf(cust))
      Merge.diffSnapshots(cust, newSnap, "c_custkey")
        .orderBy("c_custkey", "op")
    },
    Some("""WITH base AS (SELECT c_custkey, c_name, c_mktsegment FROM customer),
           |news AS (
           |  SELECT c_custkey, c_name,
           |         CASE WHEN c_custkey % 100 = 0 THEN 'UPDATED' ELSE c_mktsegment END AS c_mktsegment
           |  FROM base WHERE c_custkey % 9 <> 0
           |  UNION ALL
           |  SELECT -c_custkey - 1 AS c_custkey, 'NEW-' || c_name AS c_name,
           |         'FRESH' AS c_mktsegment
           |  FROM base WHERE c_custkey % 250 = 0)
           |SELECT CASE WHEN o.c_custkey IS NULL THEN 'I'
           |            WHEN n.c_custkey IS NULL THEN 'D'
           |            ELSE 'U' END AS op,
           |       coalesce(n.c_custkey, o.c_custkey) AS c_custkey,
           |       CASE WHEN n.c_custkey IS NOT NULL THEN n.c_name ELSE o.c_name END AS c_name,
           |       CASE WHEN n.c_custkey IS NOT NULL THEN n.c_mktsegment ELSE o.c_mktsegment END AS c_mktsegment
           |FROM base o FULL OUTER JOIN news n USING (c_custkey)
           |WHERE o.c_custkey IS NULL OR n.c_custkey IS NULL
           |   OR (o.c_name, o.c_mktsegment) IS DISTINCT FROM (n.c_name, n.c_mktsegment)
           |ORDER BY c_custkey, op""".stripMargin))

  // One-pass per-column profile of lineitem (string, money-decimal, and
  // date domains) — the quality census the validate stage records per
  // landed table.
  private val profileQ = Q(
    "q_profile",
    (s, dir) =>
      graft.validate.DataProfile.profile(t(s, dir, "lineitem"), Seq(
        "l_returnflag" -> identity[org.apache.spark.sql.Column] _,
        "l_quantity" -> ((c: org.apache.spark.sql.Column) => c.cast("decimal(18,2)")),
        "l_shipdate" -> ((c: org.apache.spark.sql.Column) => to_date(c))))
        .orderBy("column"),
    Some("""SELECT 'l_returnflag' AS "column", COUNT(l_returnflag) AS n_nonnull,
           |  CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           |  COUNT(DISTINCT l_returnflag) AS n_distinct,
           |  CAST(MIN(l_returnflag) AS VARCHAR) AS min_s,
           |  CAST(MAX(l_returnflag) AS VARCHAR) AS max_s
           |FROM lineitem
           |UNION ALL
           |SELECT 'l_quantity', COUNT(l_quantity),
           |  CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           |  COUNT(DISTINCT l_quantity),
           |  CAST(MIN(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR),
           |  CAST(MAX(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR)
           |FROM lineitem
           |UNION ALL
           |SELECT 'l_shipdate', COUNT(l_shipdate),
           |  CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           |  COUNT(DISTINCT l_shipdate),
           |  CAST(MIN(CAST(l_shipdate AS DATE)) AS VARCHAR),
           |  CAST(MAX(CAST(l_shipdate AS DATE)) AS VARCHAR)
           |FROM lineitem
           |ORDER BY "column"""".stripMargin))

  // The DataSourceV2 connector (sources/PostcodeSource): the reference's
  // HTTP postcode API as a splittable deterministic source. Index filters
  // push into partition planning, the region agg mirrors the reference's
  // LOWER-key count (O15), and the md5-derived fields let DuckDB replay
  // the ENTIRE source with generate_series — hash match proves the
  // distributed generator byte-identical to the sequential specification.
  private val dsv2Source = Q(
    "q_dsv2_source",
    (s, dir) => {
      val df = s.read.format("graft.sources.PostcodeSource")
        .option("rows", 10000).option("partitions", 8).load()
      df.filter(col("index") >= 100 && col("index") < 9000)
        .groupBy(lower(col("european_electoral_region")).as("region"))
        .agg(count(lit(1)).as("n"),
          min(col("eastings")).as("min_e"),
          max(col("northings")).as("max_n"),
          sum(col("quality")).as("sum_q"))
        .orderBy("region")
    },
    Some("""WITH idx AS (SELECT unnest(generate_series(0, 9999)) AS index),
           |h AS (SELECT index, md5(CAST(index AS VARCHAR)) AS hex FROM idx),
           |rows_ AS (SELECT index,
           |  CAST(('0x' || substr(hex, 1, 15))::BIGINT % 9 + 1 AS INTEGER) AS quality,
           |  CAST(('0x' || substr(hex, 17, 8))::BIGINT % 700000 AS INTEGER) AS eastings,
           |  CAST(('0x' || substr(hex, 25, 8))::BIGINT % 1300000 AS INTEGER) AS northings,
           |  (['East Midlands', 'Eastern', 'London', 'North East', 'North West',
           |    'Northern Ireland', 'Scotland', 'South East', 'South West',
           |    'Wales', 'West Midlands', 'Yorkshire and The Humber'
           |   ])[CAST(('0x' || substr(hex, 1, 15))::BIGINT % 12 AS INTEGER) + 1]
           |    AS european_electoral_region
           |  FROM h)
           |SELECT lower(european_electoral_region) AS region, COUNT(*) AS n,
           |  MIN(eastings) AS min_e, MAX(northings) AS max_n,
           |  CAST(SUM(quality) AS BIGINT) AS sum_q
           |FROM rows_ WHERE index >= 100 AND index < 9000
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  // The same connector with its NETWORK face on: rows arrive as JSONL
  // pages over real localhost HTTP (PostcodeApiTwin — the container has
  // no egress, a production user points `url` at the live service), get
  // result.*-flattened by the reader, and the oracle replays the wire
  // payload from the md5 family — hash match proves socket + paging +
  // JSON parse byte-identical to the sequential specification. min(pc)
  // exercises the string field through the wire.
  private val httpSource = Q(
    "q_http_source",
    (s, dir) => {
      val df = s.read.format("graft.sources.PostcodeSource")
        .option("rows", 5000).option("partitions", 8)
        .option("rowsPerBatch", 500)
        .option("url", graft.sources.PostcodeApiTwin.url)
        .load()
      df.filter(col("index") >= 50 && col("index") < 4500)
        .groupBy(lower(col("european_electoral_region")).as("region"))
        .agg(count(lit(1)).as("n"),
          min(col("postcode")).as("min_pc"),
          max(col("northings")).as("max_n"),
          sum(col("quality")).as("sum_q"))
        .orderBy("region")
    },
    Some("""WITH idx AS (SELECT unnest(generate_series(0, 4999)) AS index),
           |h AS (SELECT index, md5(CAST(index AS VARCHAR)) AS hex FROM idx),
           |rows_ AS (SELECT index,
           |  upper(substr(hex, 1, 4) || ' ' || substr(hex, 5, 3)) AS postcode,
           |  CAST(('0x' || substr(hex, 1, 15))::BIGINT % 9 + 1 AS INTEGER) AS quality,
           |  CAST(('0x' || substr(hex, 25, 8))::BIGINT % 1300000 AS INTEGER) AS northings,
           |  (['East Midlands', 'Eastern', 'London', 'North East', 'North West',
           |    'Northern Ireland', 'Scotland', 'South East', 'South West',
           |    'Wales', 'West Midlands', 'Yorkshire and The Humber'
           |   ])[CAST(('0x' || substr(hex, 1, 15))::BIGINT % 12 AS INTEGER) + 1]
           |    AS european_electoral_region
           |  FROM h)
           |SELECT lower(european_electoral_region) AS region, COUNT(*) AS n,
           |  MIN(postcode) AS min_pc, MAX(northings) AS max_n,
           |  CAST(SUM(quality) AS BIGINT) AS sum_q
           |FROM rows_ WHERE index >= 50 AND index < 4500
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  // Avro sink+source under oracle: the ENGINE path is
  // parquet -> AvroIO.writeAvro -> AvroIO.readAvro -> aggregate, the
  // oracle aggregates the parquet directly — hash equality proves the
  // Avro round-trip lost nothing in any column class (int32/int64/
  // double/string/timestamp). Every long SUM is cast on the DuckDB side
  // (HUGEINT tripwire) and money doubles go through exact decimal sums.
  private val avroRoundtrip = Q(
    "q_avro_roundtrip",
    (s, dir) => {
      val out = scratchDir(dir, "avro_li")
      // snappy here (deflate is AvroIOSpec's path): the query measures the
      // sink+source round-trip, and snappy is the at-scale codec choice
      graft.io.AvroIO.writeAvro(t(s, dir, "lineitem"), out, codec = "snappy")
      graft.io.AvroIO.readAvro(s, out)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          count(lit(1)).as("n"),
          sum("l_orderkey").as("sum_ok"),
          sum("l_partkey").as("sum_pk"),
          sum("l_suppkey").as("sum_sk"),
          sum(col("l_linenumber").cast("long")).as("sum_ln"),
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"),
          dsum6(col("l_discount")).as("sum_disc"),
          dsum6(col("l_tax")).as("sum_tax"),
          min(to_date(col("l_shipdate"))).as("min_ship"),
          max(to_date(col("l_shipdate"))).as("max_ship"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some(s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
            |  CAST(SUM(l_orderkey) AS BIGINT) AS sum_ok,
            |  CAST(SUM(l_partkey) AS BIGINT) AS sum_pk,
            |  CAST(SUM(l_suppkey) AS BIGINT) AS sum_sk,
            |  CAST(SUM(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS sum_ln,
            |  ${oSum("l_quantity")} AS sum_qty,
            |  ${oSum("l_extendedprice")} AS sum_price,
            |  ${oSum6("l_discount")} AS sum_disc,
            |  ${oSum6("l_tax")} AS sum_tax,
            |  MIN(CAST(l_shipdate AS DATE)) AS min_ship,
            |  MAX(CAST(l_shipdate AS DATE)) AS max_ship
            |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  // Delta-protocol interop under oracle: the ENGINE path lands lineitem
  // as TWO Manifest commits (overwrite then append over a disjoint
  // l_linenumber split), exports the `_delta_log`, and reads the table
  // back THROUGH the log (commit fold → parquet scan); the oracle
  // aggregates the source parquet directly. Hash equality proves the
  // log's active-file reconstruction neither loses nor duplicates rows
  // across commit boundaries. The scratch table is deleted up front so
  // the query is re-runnable in one JVM (Bench's best-of-two).
  private val deltaExport = Q(
    "q_delta_export",
    (s, dir) => {
      val out = scratchDir(dir, "delta_li")
      val p = new org.apache.hadoop.fs.Path(out)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val li = t(s, dir, "lineitem")
      graft.io.Manifest.write(li.filter(col("l_linenumber") <= 4), out, "base")
      graft.io.Manifest.append(li.filter(col("l_linenumber") >= 5), out, "tail")
      graft.io.DeltaLog.exportLog(s, out)
      graft.io.DeltaLog.read(s, out)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum("l_orderkey").as("sum_ok"),
          dsum(col("l_quantity")).as("sum_qty"),
          max(to_date(col("l_shipdate"))).as("max_ship"))
        .orderBy("l_returnflag")
    },
    Some(s"""SELECT l_returnflag, COUNT(*) AS n,
            |  CAST(SUM(l_orderkey) AS BIGINT) AS sum_ok,
            |  ${oSum("l_quantity")} AS sum_qty,
            |  MAX(CAST(l_shipdate AS DATE)) AS max_ship
            |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin))

  // Iceberg-v2 interop under oracle, the q_delta_export twin for the
  // OTHER table format: orders lands as two Manifest commits (even/odd
  // orderkey split), the Iceberg metadata tree is exported
  // (metadata.json + Avro manifest list + manifests with spec
  // field-ids), and the table is read back THROUGH that tree
  // (version-hint → metadata → manifest-list → manifest → parquet);
  // the oracle aggregates the source parquet directly.
  // Iceberg INCREMENTAL APPEND SCAN under oracle (round 12): orders
  // lands as a baseline commit plus two appends, the table exports to
  // Iceberg metadata, and the incremental read serves EXACTLY the two
  // appended slices (cost ∝ new files — the downstream-job pattern
  // that replaces full rescans). The aggregate over the delta hashes
  // against DuckDB's relational replay of the same two slices.
  private val icebergIncremental = Q(
    "q_iceberg_incremental",
    (s, dir) => {
      val out = scratchDir(dir, "iceberg_incr")
      val p = new org.apache.hadoop.fs.Path(out)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val o = t(s, dir, "orders")
      graft.io.Manifest.write(o.filter(col("o_orderkey") % 3 === 0),
        out, "base") // seq 0 = the consumer's baseline
      graft.io.Manifest.append(o.filter(col("o_orderkey") % 3 === 1),
        out, "batch1") // seq 1
      graft.io.Manifest.append(o.filter(col("o_orderkey") % 3 === 2),
        out, "batch2") // seq 2
      graft.io.IcebergExport.exportTable(s, out)
      graft.io.IcebergExport.readAppendsSince(s, out, 0L).get
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum("o_orderkey").as("sum_ok"),
          dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("o_orderstatus")
    },
    Some(s"""SELECT o_orderstatus, COUNT(*) AS n,
            |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_ok,
            |  ${oSum("o_totalprice")} AS sum_price
            |FROM orders WHERE o_orderkey % 3 <> 0
            |GROUP BY 1 ORDER BY 1""".stripMargin))

  // ICEBERG REFS under oracle (round 13, VERDICT r12 task 4): tag the
  // first commit via CALL <cat>.system.tag (the property rides the
  // CAS-serialized ALTER), append past it, export — the metadata tree
  // carries the refs map — and read the TAG back through
  // IcebergExport.readRef: the pinned pre-append subset, which DuckDB
  // replays relationally. The head leg reads `main` alongside, so one
  // hash proves both the pinned tag and the tracking branch.
  private val icebergRefs = Q(
    "q_iceberg_refs",
    (s, dir) => {
      val wh = scratchDir(dir, "iceberg_refs_wh")
      val p = new org.apache.hadoop.fs.Path(wh)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      s.conf.set("spark.sql.catalog.girf", "graft.catalog.GraftCatalog")
      s.conf.set("spark.sql.catalog.girf.warehouse", wh)
      s.sql("CREATE NAMESPACE girf.db")
      t(s, dir, "orders").createOrReplaceTempView("girf_src")
      s.sql(
        """CREATE TABLE girf.db.ord USING graft AS
          |SELECT o_orderkey, o_orderstatus, o_totalprice FROM girf_src
          |WHERE o_orderkey % 3 = 0""".stripMargin)
      s.sql("CALL girf.system.tag(table => 'db.ord', name => 'baseline')")
      s.sql(
        """INSERT INTO girf.db.ord
          |SELECT o_orderkey, o_orderstatus, o_totalprice FROM girf_src
          |WHERE o_orderkey % 3 <> 0""".stripMargin)
      s.sql("CALL girf.system.export_iceberg(table => 'db.ord')")
      val tblDir = s.sql("DESCRIBE TABLE EXTENDED girf.db.ord")
        .where("col_name = 'Location'").collect().head.getString(1)
      val tagged = graft.io.IcebergExport.readRef(s, tblDir, "baseline")
        .agg(count(lit(1)).as("n_tag"),
          sum("o_orderkey").as("sum_ok_tag"))
      val head = graft.io.IcebergExport.readRef(s, tblDir, "main")
        .agg(count(lit(1)).as("n_main"),
          dsum(col("o_totalprice")).as("sum_price_main"))
      tagged.crossJoin(head)
        .select(col("n_tag"), col("sum_ok_tag"), col("n_main"),
          col("sum_price_main"))
    },
    Some(s"""SELECT
            |  (SELECT COUNT(*) FROM orders WHERE o_orderkey % 3 = 0)
            |    AS n_tag,
            |  (SELECT CAST(SUM(o_orderkey) AS BIGINT) FROM orders
            |   WHERE o_orderkey % 3 = 0) AS sum_ok_tag,
            |  (SELECT COUNT(*) FROM orders) AS n_main,
            |  (SELECT ${oSum("o_totalprice")} FROM orders)
            |    AS sum_price_main""".stripMargin))

  private val icebergExport = Q(
    "q_iceberg_export",
    (s, dir) => {
      val out = scratchDir(dir, "iceberg_ord")
      val p = new org.apache.hadoop.fs.Path(out)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val o = t(s, dir, "orders")
      graft.io.Manifest.write(o.filter(col("o_orderkey") % 2 === 0), out, "even")
      graft.io.Manifest.append(o.filter(col("o_orderkey") % 2 === 1), out, "odd")
      graft.io.IcebergExport.exportTable(s, out)
      graft.io.IcebergExport.read(s, out)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum("o_custkey").as("sum_ck"),
          dsum(col("o_totalprice")).as("sum_price"),
          max(to_date(col("o_orderdate"))).as("max_date"))
        .orderBy("o_orderstatus")
    },
    Some(s"""SELECT o_orderstatus, COUNT(*) AS n,
            |  CAST(SUM(o_custkey) AS BIGINT) AS sum_ck,
            |  ${oSum("o_totalprice")} AS sum_price,
            |  MAX(CAST(o_orderdate AS DATE)) AS max_date
            |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin))

  // Delta data skipping under oracle: lineitem lands RANGE-CLUSTERED on
  // l_shipdate (repartitionByRange — the zone-map-friendly layout), the
  // export attaches parquet-footer stats to every add action, and the
  // read goes through DeltaLog.readPruned, which drops every file whose
  // [min,max] shipdate window cannot overlap 1996 BEFORE any scan. Hash
  // equality against the oracle's plain WHERE proves the prune lost no
  // qualifying row; DeltaLogSpec proves files are actually skipped. At
  // 100 TB this is the difference between scanning a year and scanning
  // the table.
  private val deltaSkipping = Q(
    "q_delta_skipping",
    (s, dir) => {
      val out = scratchDir(dir, "delta_skip")
      val p = new org.apache.hadoop.fs.Path(out)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      graft.io.Manifest.write(
        t(s, dir, "lineitem").repartitionByRange(8, col("l_shipdate")),
        out, "clustered")
      graft.io.DeltaLog.exportLog(s, out)
      graft.io.DeltaLog.readPruned(s, out, "l_shipdate",
          "1996-01-01T00:00:00.000000", "1996-12-31T23:59:59.999999")
        .where(to_date(col("l_shipdate"))
          .between(lit("1996-01-01"), lit("1996-12-31")))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum("l_orderkey").as("sum_ok"),
          dsum(col("l_quantity")).as("sum_qty"),
          max(to_date(col("l_shipdate"))).as("max_ship"))
        .orderBy("l_returnflag")
    },
    Some(s"""SELECT l_returnflag, COUNT(*) AS n,
            |  CAST(SUM(l_orderkey) AS BIGINT) AS sum_ok,
            |  ${oSum("l_quantity")} AS sum_qty,
            |  MAX(CAST(l_shipdate AS DATE)) AS max_ship
            |FROM lineitem
            |WHERE CAST(l_shipdate AS DATE)
            |  BETWEEN DATE'1996-01-01' AND DATE'1996-12-31'
            |GROUP BY 1 ORDER BY 1""".stripMargin))

  // Copy-on-write DELETE under oracle: lineitem lands range-clustered
  // on l_shipdate, Manifest.deleteRange removes 1997 — rewriting ONLY
  // the files whose footer bounds overlap the year (ManifestSpec proves
  // the carried files are referenced verbatim, zero copies) — and the
  // post-delete snapshot is aggregated; the oracle applies the
  // complementary WHERE to the source parquet. Hash equality proves the
  // stats-confined rewrite deleted exactly the range: nothing more
  // (carried rows all present), nothing less (no 1997 row survived in
  // an untouched file).
  private val cowDelete = Q(
    "q_cow_delete",
    (s, dir) => {
      val out = scratchDir(dir, "cow_del")
      val p = new org.apache.hadoop.fs.Path(out)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      graft.io.Manifest.write(
        t(s, dir, "lineitem").repartitionByRange(8, col("l_shipdate")),
        out, "base")
      graft.io.Manifest.deleteRange(s, out, "l_shipdate",
        "1997-01-01T00:00:00.000000", "1997-12-31T23:59:59.999999", "del97")
      graft.io.Manifest.read(s, out)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum("l_orderkey").as("sum_ok"),
          dsum(col("l_quantity")).as("sum_qty"),
          min(to_date(col("l_shipdate"))).as("min_ship"),
          max(to_date(col("l_shipdate"))).as("max_ship"))
        .orderBy("l_returnflag")
    },
    Some(s"""SELECT l_returnflag, COUNT(*) AS n,
            |  CAST(SUM(l_orderkey) AS BIGINT) AS sum_ok,
            |  ${oSum("l_quantity")} AS sum_qty,
            |  MIN(CAST(l_shipdate AS DATE)) AS min_ship,
            |  MAX(CAST(l_shipdate AS DATE)) AS max_ship
            |FROM lineitem
            |WHERE CAST(l_shipdate AS DATE)
            |  NOT BETWEEN DATE'1997-01-01' AND DATE'1997-12-31'
            |GROUP BY 1 ORDER BY 1""".stripMargin))

  // Hive-partitioned Manifest table under oracle: documents lands
  // partitioned BY LANGUAGE (writePartitioned → data-<snap>/lang=xx/
  // layout listed in the manifest), the read selects ONE language by
  // exact k=v match on the manifest's own file list (no footer reads,
  // no data-tree listing — the dominant 100 TB access pattern), and the
  // recovered partition column plus the data columns aggregate per
  // source; the oracle applies WHERE lang='de' to the source parquet.
  // Hash equality proves partition routing at write time lost no row to
  // a wrong directory AND the prune lost no qualifying row.
  private val partitionedRead = Q(
    "q_partitioned_read",
    (s, dir) => {
      val out = scratchDir(dir, "part_docs")
      val p = new org.apache.hadoop.fs.Path(out)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      graft.io.Manifest.writePartitioned(
        t(s, dir, "documents"), out, "bylang", Seq("lang"))
      graft.io.Manifest.readWherePartitions(s, out, Map("lang" -> "de"))
        .groupBy("source")
        .agg(count(lit(1)).as("n"),
          sum("n_chars").as("sum_chars"),
          min("doc_id").as("min_doc"),
          max("doc_id").as("max_doc"))
        .orderBy("source")
    },
    Some("""SELECT source, COUNT(*) AS n,
           |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
           |FROM documents WHERE lang = 'de'
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  // Partition pruning THROUGH the Delta log: the partitioned table's
  // export carries partitionColumns + per-file partitionValues, and the
  // read resolves matching files straight off the log (exact path-value
  // equality, tighter than bounds) before any scan; oracle = plain
  // WHERE. q_partitioned_read proves the manifest-level prune, this
  // proves the table-format face of the same layout.
  private val deltaPartitionPrune = Q(
    "q_delta_partition_prune",
    (s, dir) => {
      val out = scratchDir(dir, "part_delta")
      val p = new org.apache.hadoop.fs.Path(out)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      graft.io.Manifest.writePartitioned(
        t(s, dir, "documents"), out, "bylang", Seq("lang"))
      graft.io.DeltaLog.exportLog(s, out)
      graft.io.DeltaLog.readPartitionPruned(s, out, Map("lang" -> "en"))
        .groupBy("source")
        .agg(count(lit(1)).as("n"),
          sum("n_chars").as("sum_chars"),
          max("doc_id").as("max_doc"))
        .orderBy("source")
    },
    Some("""SELECT source, COUNT(*) AS n,
           |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           |  MAX(doc_id) AS max_doc
           |FROM documents WHERE lang = 'en'
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  // MERGE-ON-READ DELETE under oracle: same clustered lineitem land,
  // but deleting 1998 writes a kilobyte position-delete file instead of
  // rewriting the overlapping files (ManifestSpec proves the data files
  // stay byte-identical); the read applies the delete set as a
  // broadcast anti-join on (file, row-index). Hash equality against the
  // oracle's complementary WHERE proves the position capture and the
  // anti-join drop EXACTLY the range - the Iceberg-v2 delete-file
  // semantics, end to end in-engine.
  private val morDelete = Q(
    "q_mor_delete",
    (s, dir) => {
      val out = scratchDir(dir, "mor_del")
      val p = new org.apache.hadoop.fs.Path(out)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      graft.io.Manifest.write(
        t(s, dir, "lineitem").repartitionByRange(8, col("l_shipdate")),
        out, "base")
      graft.io.Manifest.deleteRangeMOR(s, out, "l_shipdate",
        "1998-01-01T00:00:00.000000", "1998-12-31T23:59:59.999999", "del98")
      graft.io.Manifest.read(s, out)
        .groupBy("l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum("l_orderkey").as("sum_ok"),
          dsum(col("l_quantity")).as("sum_qty"),
          min(to_date(col("l_shipdate"))).as("min_ship"),
          max(to_date(col("l_shipdate"))).as("max_ship"))
        .orderBy("l_linestatus")
    },
    Some(s"""SELECT l_linestatus, COUNT(*) AS n,
            |  CAST(SUM(l_orderkey) AS BIGINT) AS sum_ok,
            |  ${oSum("l_quantity")} AS sum_qty,
            |  MIN(CAST(l_shipdate AS DATE)) AS min_ship,
            |  MAX(CAST(l_shipdate AS DATE)) AS max_ship
            |FROM lineitem
            |WHERE CAST(l_shipdate AS DATE)
            |  NOT BETWEEN DATE'1998-01-01' AND DATE'1998-12-31'
            |GROUP BY 1 ORDER BY 1""".stripMargin))

  // The Iceberg MOR READ path under oracle: after a position delete,
  // the table is exported (content=1 delete manifest + converted
  // full-URI delete parquets) and read back THROUGH the metadata tree —
  // manifest-list walk, content routing, delete-set anti-join — so the
  // v2 merge-on-read reader itself is hash-proven, not just spec-proven.
  private val icebergMorRead = Q(
    "q_iceberg_mor_read",
    (s, dir) => {
      val out = scratchDir(dir, "iceberg_mor")
      val p = new org.apache.hadoop.fs.Path(out)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      graft.io.Manifest.write(
        t(s, dir, "orders").repartitionByRange(8, col("o_orderkey")),
        out, "base")
      graft.io.Manifest.deleteRangeMOR(s, out, "o_orderkey", "1000", "4999", "mor")
      graft.io.IcebergExport.exportTable(s, out)
      graft.io.IcebergExport.read(s, out)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum("o_orderkey").as("sum_ok"),
          dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("o_orderstatus")
    },
    Some(s"""SELECT o_orderstatus, COUNT(*) AS n,
            |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_ok,
            |  ${oSum("o_totalprice")} AS sum_price
            |FROM orders WHERE o_orderkey NOT BETWEEN 1000 AND 4999
            |GROUP BY 1 ORDER BY 1""".stripMargin))

  // The Delta face of the same MOR state (round 8): the export now
  // EMITS deletion vectors (content-addressed DV files per the public
  // portable-RoaringBitmapArray format, descriptors on re-added
  // actions, protocol upgraded to reader-v3/deletionVectors) and the
  // read path decodes + anti-joins them — so the ENTIRE DV write→log→
  // guard→decode→apply cycle is hash-proven against DuckDB, not just
  // spec-proven against hand-authored bytes.
  private val deltaDvRead = Q(
    "q_delta_dv_read",
    (s, dir) => {
      val out = scratchDir(dir, "delta_dv")
      val p = new org.apache.hadoop.fs.Path(out)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      graft.io.Manifest.write(
        t(s, dir, "orders").repartitionByRange(8, col("o_orderkey")),
        out, "base")
      graft.io.Manifest.deleteRangeMOR(s, out, "o_orderkey", "1000", "4999", "mor")
      graft.io.DeltaLog.exportLog(s, out)
      graft.io.DeltaLog.read(s, out)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum("o_orderkey").as("sum_ok"),
          dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("o_orderstatus")
    },
    Some(s"""SELECT o_orderstatus, COUNT(*) AS n,
            |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_ok,
            |  ${oSum("o_totalprice")} AS sum_price
            |FROM orders WHERE o_orderkey NOT BETWEEN 1000 AND 4999
            |GROUP BY 1 ORDER BY 1""".stripMargin))

  // Copy-on-write UPDATE under oracle, deleteRange's DML twin: orders
  // lands range-clustered on o_orderdate, updateRange re-prioritizes
  // every 1997 order (set expressions see the row's other columns),
  // rewriting only the files whose footer bounds overlap the year; the
  // oracle applies the same CASE WHEN to the source parquet. Hash
  // equality proves the confined rewrite updated exactly the range and
  // left carried rows bit-identical.
  private val cowUpdate = Q(
    "q_cow_update",
    (s, dir) => {
      val out = scratchDir(dir, "cow_upd")
      val p = new org.apache.hadoop.fs.Path(out)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      graft.io.Manifest.write(
        t(s, dir, "orders").repartitionByRange(8, col("o_orderdate")),
        out, "base")
      graft.io.Manifest.updateRange(s, out, "o_orderdate",
        "1997-01-01T00:00:00.000000", "1997-12-31T23:59:59.999999", "reprio97",
        Map("o_orderpriority" ->
          concat(lit("0-REVIEWED-"), substring(col("o_orderpriority"), 1, 1))))
      graft.io.Manifest.read(s, out)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum("o_orderkey").as("sum_ok"),
          dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("o_orderpriority")
    },
    Some(s"""SELECT CASE WHEN CAST(o_orderdate AS DATE)
            |    BETWEEN DATE'1997-01-01' AND DATE'1997-12-31'
            |  THEN '0-REVIEWED-' || substr(o_orderpriority, 1, 1)
            |  ELSE o_orderpriority END AS o_orderpriority,
            |  COUNT(*) AS n,
            |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_ok,
            |  ${oSum("o_totalprice")} AS sum_price
            |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin))

  // Iceberg data skipping under oracle, the q_delta_skipping twin
  // through the OTHER format's stats: orders lands range-clustered on
  // o_custkey, the manifests carry lower_bounds/upper_bounds in the
  // spec's single-value binary serialization, and readPruned decodes
  // those bytes to drop non-overlapping files before the scan — so hash
  // equality ALSO proves the binary round-trip (encode at export,
  // little-endian decode at plan time) bit-exact.
  private val icebergStats = Q(
    "q_iceberg_stats",
    (s, dir) => {
      val out = scratchDir(dir, "iceberg_skip")
      val p = new org.apache.hadoop.fs.Path(out)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      graft.io.Manifest.write(
        t(s, dir, "orders").repartitionByRange(8, col("o_custkey")),
        out, "clustered")
      graft.io.IcebergExport.exportTable(s, out)
      graft.io.IcebergExport.readPruned(s, out, "o_custkey", "100", "400")
        .where(col("o_custkey").between(100, 400))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum("o_custkey").as("sum_ck"),
          dsum(col("o_totalprice")).as("sum_price"),
          max(to_date(col("o_orderdate"))).as("max_date"))
        .orderBy("o_orderpriority")
    },
    Some(s"""SELECT o_orderpriority, COUNT(*) AS n,
            |  CAST(SUM(o_custkey) AS BIGINT) AS sum_ck,
            |  ${oSum("o_totalprice")} AS sum_price,
            |  MAX(CAST(o_orderdate AS DATE)) AS max_date
            |FROM orders WHERE o_custkey BETWEEN 100 AND 400
            |GROUP BY 1 ORDER BY 1""".stripMargin))

  // The DSv2 face of the Avro source under oracle: read back through
  // spark.read.format(...) (planner-integrated — column pruning pushes a
  // projected reader schema into the decoder, AvroSourceV2Spec asserts
  // the shrunken ReadSchema) and aggregate two pruned columns; the
  // oracle aggregates the parquet directly.
  private val avroSourceV2Q = Q(
    "q_avro_source_v2",
    (s, dir) => {
      val out = scratchDir(dir, "avro_v2")
      graft.io.AvroIO.writeAvro(
        t(s, dir, "lineitem").select("l_returnflag", "l_quantity", "l_orderkey"),
        out, codec = "snappy")
      s.read.format("graft.sources.AvroSourceV2").load(out)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("l_returnflag")
    },
    Some(s"""SELECT l_returnflag, COUNT(*) AS n, ${oSum("l_quantity")} AS sum_qty
            |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin))

  // CHANGE DATA FEED under oracle (round 9): orders lands, a COW
  // deleteRange rewrites (the commit class the file-diff change reader
  // refuses to span), then a subset re-appends; the export materializes
  // _change_data + cdc actions and readChanges serves the row-level
  // changes ACROSS the rewrite. The oracle replays both change sets
  // from the source parquet — hash equality proves the bag-difference
  // derivation emits exactly the deleted and inserted rows, nothing
  // re-packed.
  private val deltaCdf = Q(
    "q_delta_cdf",
    (s, dir) => {
      val out = scratchDir(dir, "delta_cdf")
      val p = new org.apache.hadoop.fs.Path(out)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val o = t(s, dir, "orders")
      graft.io.Manifest.write(o.repartitionByRange(8, col("o_orderkey")),
        out, "base")
      graft.io.Manifest.deleteRange(s, out, "o_orderkey", "1000", "4999", "cut")
      // modulo predicate: nonempty at EVERY fixture scale (a contiguous
      // key range can fall entirely between sf0.001's sparse orderkeys,
      // emptying the insert leg and dropping its group)
      graft.io.Manifest.append(
        o.filter(col("o_orderkey") % 10 === 3), out, "back")
      graft.io.DeltaLog.exportLog(s, out, changeData = true)
      graft.io.DeltaLog.readChanges(s, out, 0L)
        .groupBy("_change_type")
        .agg(count(lit(1)).as("n"),
          sum("o_orderkey").as("sum_ok"),
          dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("_change_type")
    },
    Some(s"""SELECT * FROM (
            |  SELECT 'delete' AS _change_type, COUNT(*) AS n,
            |    CAST(SUM(o_orderkey) AS BIGINT) AS sum_ok,
            |    ${oSum("o_totalprice")} AS sum_price
            |  FROM orders WHERE o_orderkey BETWEEN 1000 AND 4999
            |  UNION ALL
            |  SELECT 'insert', COUNT(*),
            |    CAST(SUM(o_orderkey) AS BIGINT),
            |    ${oSum("o_totalprice")}
            |  FROM orders WHERE o_orderkey % 10 = 3
            |) ORDER BY _change_type""".stripMargin))

  // The engine's OWN table format as a first-class Spark data source
  // (round 9): orders lands as a hive-partitioned Manifest commit and
  // reads back through `spark.read.format("graft")` — the planner's
  // pushed partition filter prunes to the `o_orderpriority=1-URGENT`
  // directories inside GraftFileIndex, the scan is Spark's native
  // vectorized parquet path, and the oracle replays the same predicate
  // over the source parquet. Hash equality proves the source's manifest
  // resolution + partition prune lose and duplicate nothing.
  private val graftSourceQ = Q(
    "q_graft_source",
    (s, dir) => {
      val out = scratchDir(dir, "graft_src")
      val p = new org.apache.hadoop.fs.Path(out)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      graft.io.Manifest.writePartitioned(
        t(s, dir, "orders"), out, "base", Seq("o_orderpriority"))
      s.read.format("graft").load(out)
        .where(col("o_orderpriority") === "1-URGENT" &&
          col("o_custkey") >= 100)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum("o_orderkey").as("sum_ok"),
          dsum(col("o_totalprice")).as("sum_price"),
          max(to_date(col("o_orderdate"))).as("max_date"))
        .orderBy("o_orderstatus")
    },
    Some(s"""SELECT o_orderstatus, COUNT(*) AS n,
            |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_ok,
            |  ${oSum("o_totalprice")} AS sum_price,
            |  MAX(CAST(o_orderdate AS DATE)) AS max_date
            |FROM orders
            |WHERE o_orderpriority = '1-URGENT' AND o_custkey >= 100
            |GROUP BY 1 ORDER BY 1""".stripMargin))

  // The WRITE face under oracle (round 9): lineitem lands through
  // `df.write.format("graft")` — an overwrite commit then an append
  // commit over a disjoint l_linenumber split — and reads back through
  // the source; the oracle aggregates the source parquet. Hash equality
  // proves the Spark-API write path (save-mode mapping → Manifest
  // commits) loses and duplicates nothing across the two commit kinds.
  private val graftSink = Q(
    "q_graft_sink",
    (s, dir) => {
      val out = scratchDir(dir, "graft_sink")
      val p = new org.apache.hadoop.fs.Path(out)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val li = t(s, dir, "lineitem")
      li.filter(col("l_linenumber") <= 4)
        .write.format("graft").mode("overwrite").save(out)
      li.filter(col("l_linenumber") >= 5)
        .write.format("graft").mode("append").save(out)
      s.read.format("graft").load(out)
        .groupBy("l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum("l_orderkey").as("sum_ok"),
          dsum(col("l_quantity")).as("sum_qty"),
          max(to_date(col("l_shipdate"))).as("max_ship"))
        .orderBy("l_linestatus")
    },
    Some(s"""SELECT l_linestatus, COUNT(*) AS n,
            |  CAST(SUM(l_orderkey) AS BIGINT) AS sum_ok,
            |  ${oSum("l_quantity")} AS sum_qty,
            |  MAX(CAST(l_shipdate AS DATE)) AS max_ship
            |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin))

  // The STREAMING faces under oracle (round 9): lineitem lands as a
  // two-commit graft table, a Structured Streaming job relays it
  // graft→graft (readStream offsets = commit seqs; writeStream lands
  // exactly-once stream-b<id> commits), and the RELAYED table is what
  // aggregates against the oracle's plain scan of the source parquet.
  // Hash equality proves the stream served every committed row exactly
  // once across the offset windows — the end-to-end streaming
  // pipeline shape, not a unit property.
  private val graftStream = Q(
    "q_graft_stream",
    (s, dir) => {
      val src = scratchDir(dir, "graft_stream_src")
      val out = scratchDir(dir, "graft_stream_out")
      val ckpt = scratchDir(dir, "graft_stream_ckpt")
      Seq(src, out, ckpt).foreach { d =>
        val p = new org.apache.hadoop.fs.Path(d)
        p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      }
      val li = t(s, dir, "lineitem")
      graft.io.Manifest.write(li.filter(col("l_linenumber") <= 3), src, "v0")
      graft.io.Manifest.append(li.filter(col("l_linenumber") >= 4), src, "v1")
      s.readStream.format("graft").load(src)
        .writeStream.format("graft").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
      s.read.format("graft").load(out)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum("l_orderkey").as("sum_ok"),
          dsum(col("l_quantity")).as("sum_qty"),
          max(to_date(col("l_shipdate"))).as("max_ship"))
        .orderBy("l_returnflag")
    },
    Some(s"""SELECT l_returnflag, COUNT(*) AS n,
            |  CAST(SUM(l_orderkey) AS BIGINT) AS sum_ok,
            |  ${oSum("l_quantity")} AS sum_qty,
            |  MAX(CAST(l_shipdate AS DATE)) AS max_ship
            |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin))

  // Native DSv2 streaming write (round 13): `writeStream.toTable` into
  // a PARTITIONED catalog table — the standard lakehouse API the
  // land→curated cadence expects. The source is a graft catalog table
  // seeded in two commits and drained with maxCommitsPerTrigger=1, so
  // TWO epochs land as two native epoch-append manifest commits
  // (per-(queryId, epochId) snapshot ids = the replay-dedupe txn
  // records), through executor-side parquet writers producing the hive
  // layout. The aggregate reads the streamed table back; DuckDB
  // replays it relationally over the source parquet.
  private val graftStreamSink = Q(
    "q_graft_stream_sink",
    (s, dir) => {
      val wh = scratchDir(dir, "graft_ssink_wh")
      val ckpt = scratchDir(dir, "graft_ssink_ckpt")
      Seq(wh, ckpt).foreach { d =>
        val p = new org.apache.hadoop.fs.Path(d)
        p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      }
      s.conf.set("spark.sql.catalog.gssw", "graft.catalog.GraftCatalog")
      s.conf.set("spark.sql.catalog.gssw.warehouse", wh)
      s.sql("CREATE NAMESPACE gssw.db")
      t(s, dir, "customer").createOrReplaceTempView("gssw_src")
      s.sql(
        """CREATE TABLE gssw.db.src USING graft AS
          |SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_mktsegment,
          |  c_acctbal
          |FROM gssw_src WHERE c_custkey % 2 = 0""".stripMargin)
      s.sql(
        """INSERT INTO gssw.db.src
          |SELECT CAST(c_custkey AS BIGINT), c_mktsegment, c_acctbal
          |FROM gssw_src WHERE c_custkey % 2 = 1""".stripMargin)
      s.sql(
        """CREATE TABLE gssw.db.dst (c_custkey BIGINT,
          |  c_mktsegment STRING, c_acctbal DOUBLE) USING graft
          |PARTITIONED BY (c_mktsegment)""".stripMargin)
      s.readStream.option("maxCommitsPerTrigger", "1").table("gssw.db.src")
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .toTable("gssw.db.dst").awaitTermination()
      s.sql(
        """SELECT c_mktsegment, COUNT(*) AS n,
          |  SUM(c_custkey) AS sum_key,
          |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
          |FROM gssw.db.dst GROUP BY 1 ORDER BY 1""".stripMargin)
    },
    Some(s"""SELECT c_mktsegment, COUNT(*) AS n,
            |  CAST(SUM(c_custkey) AS BIGINT) AS sum_key,
            |  ${oSum("c_acctbal")} AS sum_bal
            |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin))

  // Time travel through the source's options: two commits land a
  // disjoint l_linenumber split, `versionAsOf 0` reads the FIRST
  // commit's state through the public API, and the oracle replays the
  // v0 subset — the "what did the model train on" provenance read,
  // exercised through spark.read instead of a library call.
  private val graftAsof = Q(
    "q_graft_asof",
    (s, dir) => {
      val out = scratchDir(dir, "graft_asof")
      val p = new org.apache.hadoop.fs.Path(out)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val li = t(s, dir, "lineitem")
      graft.io.Manifest.write(li.filter(col("l_linenumber") <= 3), out, "v0")
      graft.io.Manifest.append(li.filter(col("l_linenumber") >= 4), out, "v1")
      s.read.format("graft").option("versionAsOf", "0").load(out)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum("l_orderkey").as("sum_ok"),
          dsum(col("l_quantity")).as("sum_qty"),
          max(to_date(col("l_shipdate"))).as("max_ship"))
        .orderBy("l_returnflag")
    },
    Some(s"""SELECT l_returnflag, COUNT(*) AS n,
            |  CAST(SUM(l_orderkey) AS BIGINT) AS sum_ok,
            |  ${oSum("l_quantity")} AS sum_qty,
            |  MAX(CAST(l_shipdate AS DATE)) AS max_ship
            |FROM lineitem WHERE l_linenumber <= 3
            |GROUP BY 1 ORDER BY 1""".stripMargin))

  // SQL ROW-LEVEL DML over the engine's own table format (round 10):
  // orders lands range-clustered as a graft table, an analyst-shaped
  // `DELETE FROM` statement (two-predicate condition) runs through
  // plain spark.sql over a temp view, and the POST-DELETE table is what
  // aggregates against the oracle's complementary WHERE over the source
  // parquet. Hash equality proves the COW rewrite (overlapping files
  // rewritten under SQL NULL semantics, the rest carried by reference)
  // deletes exactly the condition's rows — nothing more, nothing less.
  private val graftSqlDelete = Q(
    "q_graft_sql_delete",
    (s, dir) => {
      val out = scratchDir(dir, "graft_sql_del")
      val p = new org.apache.hadoop.fs.Path(out)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      graft.io.Manifest.write(
        t(s, dir, "orders").repartitionByRange(8, col("o_orderkey")),
        out, "base")
      s.read.format("graft").load(out)
        .createOrReplaceTempView("graft_dml_orders")
      s.sql("DELETE FROM graft_dml_orders WHERE " +
        "o_orderkey BETWEEN 1000 AND 4999 AND o_orderstatus = 'O'")
      s.read.format("graft").load(out)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum("o_orderkey").as("sum_ok"),
          dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("o_orderpriority")
    },
    Some(s"""SELECT o_orderpriority, COUNT(*) AS n,
            |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_ok,
            |  ${oSum("o_totalprice")} AS sum_price
            |FROM orders
            |WHERE NOT (o_orderkey BETWEEN 1000 AND 4999 AND o_orderstatus = 'O')
            |GROUP BY 1 ORDER BY 1""".stripMargin))

  // SQL DELETE with an UNCORRELATED IN-subquery under oracle (round
  // 11): the GDPR / right-to-erasure shape — the keys to purge come
  // from another relation, not a literal list. The subquery stays in
  // predicate position through the rewrite (null-aware planning
  // preserved; the spec proves the NOT-IN/NULL corner), and the
  // post-delete aggregate hashes against DuckDB running the SAME
  // subquery shape over the raw parquet.
  private val graftSubqDelete = Q(
    "q_graft_subq_delete",
    (s, dir) => {
      val out = scratchDir(dir, "graft_subq_del")
      val p = new org.apache.hadoop.fs.Path(out)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      graft.io.Manifest.write(
        t(s, dir, "orders").repartitionByRange(8, col("o_orderkey")),
        out, "base")
      s.read.format("graft").load(out)
        .createOrReplaceTempView("graft_subq_orders")
      t(s, dir, "customer").createOrReplaceTempView("graft_subq_cust")
      s.sql(
        """DELETE FROM graft_subq_orders WHERE o_custkey IN
          |(SELECT c_custkey FROM graft_subq_cust
          | WHERE c_mktsegment = 'BUILDING')""".stripMargin)
      s.read.format("graft").load(out)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum("o_orderkey").as("sum_ok"),
          dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("o_orderpriority")
    },
    Some(s"""SELECT o_orderpriority, COUNT(*) AS n,
            |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_ok,
            |  ${oSum("o_totalprice")} AS sum_price
            |FROM orders
            |WHERE (o_custkey IN (SELECT c_custkey FROM customer
            |                     WHERE c_mktsegment = 'BUILDING'))
            |      IS NOT TRUE
            |GROUP BY 1 ORDER BY 1""".stripMargin))

  // CORRELATED subqueries in DML under oracle (round 12): the other
  // half of the GDPR shape — `DELETE WHERE EXISTS (… WHERE s.k = t.k
  // AND …)` — plans the condition as a Filter over the pinned,
  // file-restricted target plan (attribute ids intact, Catalyst
  // decorrelates it to the semi-join it is), then a correlated IN
  // drives an UPDATE over the survivors. DuckDB replays both
  // statements relationally; `IS NOT TRUE` keeps SQL's delete-only-
  // where-TRUE contract explicit in the oracle.
  private val graftCorrDml = Q(
    "q_graft_corr_dml",
    (s, dir) => {
      val out = scratchDir(dir, "graft_corr_dml")
      val p = new org.apache.hadoop.fs.Path(out)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      graft.io.Manifest.write(
        t(s, dir, "orders").repartitionByRange(8, col("o_orderkey")),
        out, "base")
      s.read.format("graft").load(out)
        .createOrReplaceTempView("graft_corr_orders")
      t(s, dir, "customer").createOrReplaceTempView("graft_corr_cust")
      s.sql(
        """DELETE FROM graft_corr_orders t WHERE EXISTS
          |(SELECT 1 FROM graft_corr_cust c
          | WHERE c.c_custkey = t.o_custkey
          |   AND c.c_mktsegment = 'MACHINERY' AND c.c_acctbal < 0)""".stripMargin)
      s.read.format("graft").load(out)
        .createOrReplaceTempView("graft_corr_orders2")
      s.sql(
        """UPDATE graft_corr_orders2 t SET o_orderstatus = 'X'
          |WHERE o_custkey IN
          |  (SELECT c.c_custkey FROM graft_corr_cust c
          |   WHERE c.c_custkey = t.o_custkey AND c.c_acctbal > 9000)""".stripMargin)
      s.read.format("graft").load(out)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum("o_orderkey").as("sum_ok"),
          dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("o_orderstatus")
    },
    Some(s"""WITH survived AS (
            |  SELECT * FROM orders t
            |  WHERE (EXISTS (SELECT 1 FROM customer c
            |                 WHERE c.c_custkey = t.o_custkey
            |                   AND c.c_mktsegment = 'MACHINERY'
            |                   AND c.c_acctbal < 0)) IS NOT TRUE),
            |updated AS (
            |  SELECT o_orderkey, o_totalprice,
            |    CASE WHEN (o_custkey IN
            |          (SELECT c.c_custkey FROM customer c
            |           WHERE c.c_custkey = t.o_custkey
            |             AND c.c_acctbal > 9000)) IS TRUE
            |         THEN 'X' ELSE o_orderstatus END AS o_orderstatus
            |  FROM survived t)
            |SELECT o_orderstatus, COUNT(*) AS n,
            |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_ok,
            |  ${oSum("o_totalprice")} AS sum_price
            |FROM updated GROUP BY 1 ORDER BY 1""".stripMargin))

  // CORRELATED SET under oracle (round 13): `UPDATE t SET bal =
  // (SELECT SUM(…) FROM orders o WHERE o.o_custkey = t.c_custkey)` —
  // the per-row correlated assignment VERDICT r12 task 3 asked for,
  // executed by planting the scalar subquery in PROJECT position over
  // the pinned hit frame (Catalyst decorrelates it into the lateral
  // join). Customers with no orders take the scalar-subquery NULL;
  // rows outside the WHERE stay bit-identical. DuckDB replays the
  // update as a grouped LEFT-JOIN CASE.
  private val graftCorrUpdateSet = Q(
    "q_graft_corr_update_set",
    (s, dir) => {
      val out = scratchDir(dir, "graft_cupd")
      val p = new org.apache.hadoop.fs.Path(out)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      graft.io.Manifest.write(
        t(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
          .repartitionByRange(8, col("c_custkey")),
        out, "base")
      s.read.format("graft").load(out)
        .createOrReplaceTempView("graft_cupd_t")
      t(s, dir, "orders").createOrReplaceTempView("graft_cupd_o")
      s.sql(
        """UPDATE graft_cupd_t t SET c_acctbal =
          |  (SELECT CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
          |          AS DOUBLE)
          |   FROM graft_cupd_o o WHERE o.o_custkey = t.c_custkey)
          |WHERE c_custkey % 10 = 0""".stripMargin)
      s.read.format("graft").load(out)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          count(col("c_acctbal")).as("n_bal"),
          dsum(col("c_acctbal")).as("sum_bal"))
        .orderBy("c_mktsegment")
    },
    Some(s"""WITH sums AS (
            |  SELECT o_custkey,
            |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s
            |  FROM orders GROUP BY 1),
            |upd AS (
            |  SELECT c.c_mktsegment,
            |    CASE WHEN c.c_custkey % 10 = 0 THEN m.s
            |         ELSE c.c_acctbal END AS bal
            |  FROM customer c LEFT JOIN sums m ON m.o_custkey = c.c_custkey)
            |SELECT c_mktsegment, COUNT(*) AS n, COUNT(bal) AS n_bal,
            |  ${oSum("bal")} AS sum_bal
            |FROM upd GROUP BY 1 ORDER BY 1""".stripMargin))

  // NATIVE CHANGE DATA FEED under oracle (round 13): the face the
  // plain changesSince diff refuses — DML commits record their changed
  // rows as cdc parquet at commit time (cost ∝ changed rows), appends
  // derive inserts from their added files, and
  // `.option("readChangeFeed", "true")` serves the typed row-level
  // history. The fixture appends a slice then deletes and updates
  // DISJOINT predicates (mod arithmetic keeps the appended rows out of
  // both DML hit sets), so DuckDB replays each change class as an
  // independent aggregate over the base table.
  private val graftCdf = Q(
    "q_graft_cdf",
    (s, dir) => {
      val out = scratchDir(dir, "graft_cdf")
      val p = new org.apache.hadoop.fs.Path(out)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      graft.io.Manifest.write(
        t(s, dir, "orders").repartitionByRange(8, col("o_orderkey")),
        out, "base")
      graft.io.Manifest.append(
        t(s, dir, "orders").where("o_custkey % 50 = 1"), out, "landed")
      s.read.format("graft").load(out)
        .createOrReplaceTempView("graft_cdf_t")
      s.sql("DELETE FROM graft_cdf_t " +
        "WHERE o_orderstatus = 'F' AND o_custkey % 10 = 3")
      s.read.format("graft").load(out)
        .createOrReplaceTempView("graft_cdf_t2")
      s.sql("UPDATE graft_cdf_t2 SET o_totalprice = o_totalprice * 2 " +
        "WHERE o_orderstatus = 'O' AND o_custkey % 25 = 7")
      s.read.format("graft")
        .option("readChangeFeed", "true").option("changesSince", "base")
        .load(out)
        .groupBy(col("_change_type").as("change_type"))
        .agg(count(lit(1)).as("n"),
          sum("o_orderkey").as("sum_ok"),
          dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("change_type")
    },
    Some(s"""SELECT 'delete' AS change_type, COUNT(*) AS n,
            |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_ok,
            |  ${oSum("o_totalprice")} AS sum_price
            |FROM orders WHERE o_orderstatus = 'F' AND o_custkey % 10 = 3
            |UNION ALL
            |SELECT 'insert', COUNT(*),
            |  CAST(SUM(o_orderkey) AS BIGINT), ${oSum("o_totalprice")}
            |FROM orders WHERE o_custkey % 50 = 1
            |UNION ALL
            |SELECT 'update_preimage', COUNT(*),
            |  CAST(SUM(o_orderkey) AS BIGINT), ${oSum("o_totalprice")}
            |FROM orders WHERE o_orderstatus = 'O' AND o_custkey % 25 = 7
            |UNION ALL
            |SELECT 'update_postimage', COUNT(*),
            |  CAST(SUM(o_orderkey) AS BIGINT), ${oSum("o_totalprice * 2")}
            |FROM orders WHERE o_orderstatus = 'O' AND o_custkey % 25 = 7
            |ORDER BY change_type""".stripMargin))

  // MERGE-ON-READ SQL DML under oracle (round 13): a table opted in
  // via `graft.dml.mode = mor` runs DELETE as a position-delete write
  // and UPDATE as updated-copies + position deletes — data files never
  // rewrite (cost ∝ changed rows; the deletion-vector shape). The
  // aggregate reads THROUGH the merge-on-read state (anti-join inside
  // the scan), which DuckDB replays relationally over the base table.
  private val graftMorDml = Q(
    "q_graft_mor_dml",
    (s, dir) => {
      val wh = scratchDir(dir, "graft_mor_wh")
      val p = new org.apache.hadoop.fs.Path(wh)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      s.conf.set("spark.sql.catalog.gmd", "graft.catalog.GraftCatalog")
      s.conf.set("spark.sql.catalog.gmd.warehouse", wh)
      s.sql("CREATE NAMESPACE gmd.db")
      t(s, dir, "orders").createOrReplaceTempView("gmd_orders_src")
      s.sql(
        """CREATE TABLE gmd.db.ord USING graft
          |TBLPROPERTIES ('graft.dml.mode' = 'mor')
          |AS SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
          |   FROM gmd_orders_src""".stripMargin)
      s.sql("DELETE FROM gmd.db.ord " +
        "WHERE o_orderstatus = 'F' AND o_custkey % 10 = 3")
      s.sql("UPDATE gmd.db.ord SET o_totalprice = o_totalprice * 2 " +
        "WHERE o_orderstatus = 'O' AND o_custkey % 25 = 7")
      s.sql(
        """SELECT o_orderstatus, COUNT(*) AS n,
          |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_ok,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          |    AS sum_price
          |FROM gmd.db.ord GROUP BY 1 ORDER BY 1""".stripMargin)
    },
    Some(s"""WITH survived AS (
            |  SELECT * FROM orders
            |  WHERE NOT (o_orderstatus = 'F' AND o_custkey % 10 = 3)),
            |upd AS (
            |  SELECT o_orderkey, o_orderstatus,
            |    CASE WHEN o_orderstatus = 'O' AND o_custkey % 25 = 7
            |         THEN o_totalprice * 2 ELSE o_totalprice END AS p
            |  FROM survived)
            |SELECT o_orderstatus, COUNT(*) AS n,
            |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_ok,
            |  ${oSum("p")} AS sum_price
            |FROM upd GROUP BY 1 ORDER BY 1""".stripMargin))

  // SQL MERGE INTO under oracle (round 10): customer lands as a graft
  // table, one MERGE statement applies a deterministic change batch
  // with all four action classes (conditional DELETE, UPDATE, INSERT
  // under collision-proof negated keys, untouched pass-through), and
  // the merged table is compared row-for-row against the oracle's
  // NOT-EXISTS + LEFT-JOIN + UNION replay. The delete set excludes the
  // update keys so no target row matches two source rows (the
  // statement's own cardinality guard would refuse it).
  private val graftMerge = Q(
    "q_graft_merge",
    (s, dir) => {
      val out = scratchDir(dir, "graft_merge")
      val p = new org.apache.hadoop.fs.Path(out)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      graft.io.Manifest.write(custBase(s, dir), out, "base")
      s.read.format("graft").load(out)
        .createOrReplaceTempView("graft_merge_t")
      val cust = custBase(s, dir)
      cust.filter(col("c_custkey") % 100 === 0)
        .select(col("c_custkey"), lit("UPDATED").as("seg"), lit("U").as("op"))
        .unionByName(cust
          .filter(col("c_custkey") % 170 === 0 && col("c_custkey") % 100 =!= 0)
          .select(col("c_custkey"), lit(null).cast("string").as("seg"),
            lit("D").as("op")))
        .unionByName(cust.filter(col("c_custkey") % 250 === 0)
          .select((-col("c_custkey") - 1).as("c_custkey"),
            lit("FRESH").as("seg"), lit("I").as("op")))
        .createOrReplaceTempView("graft_merge_s")
      s.sql(
        """MERGE INTO graft_merge_t t USING graft_merge_s s
          |ON t.c_custkey = s.c_custkey
          |WHEN MATCHED AND s.op = 'D' THEN DELETE
          |WHEN MATCHED THEN UPDATE SET c_mktsegment = s.seg
          |WHEN NOT MATCHED THEN INSERT (c_custkey, c_name, c_mktsegment)
          |  VALUES (s.c_custkey, CONCAT('NEW-', CAST(s.c_custkey AS STRING)),
          |          s.seg)""".stripMargin)
      s.read.format("graft").load(out).orderBy("c_custkey")
    },
    Some(s"""WITH base AS ($baseSql),
            |mods AS (SELECT c_custkey FROM base WHERE c_custkey % 100 = 0),
            |dels AS (SELECT c_custkey FROM base
            |         WHERE c_custkey % 170 = 0 AND c_custkey % 100 <> 0),
            |news AS (SELECT -c_custkey - 1 AS c_custkey FROM base
            |         WHERE c_custkey % 250 = 0)
            |SELECT * FROM (
            |  SELECT b.c_custkey, b.c_name,
            |    CASE WHEN m.c_custkey IS NOT NULL THEN 'UPDATED'
            |         ELSE b.c_mktsegment END AS c_mktsegment
            |  FROM base b LEFT JOIN mods m USING (c_custkey)
            |  WHERE NOT EXISTS (SELECT 1 FROM dels d
            |                    WHERE d.c_custkey = b.c_custkey)
            |  UNION ALL
            |  SELECT c_custkey, 'NEW-' || CAST(c_custkey AS VARCHAR), 'FRESH'
            |  FROM news
            |) ORDER BY c_custkey""".stripMargin))

  // V2 TABLE CATALOG under oracle (round 10): the reference's
  // deploy-then-query model (create_database_schema.py registers
  // tables; analysts only ever touch NAMES) driven END-TO-END through
  // catalog SQL — CREATE NAMESPACE, partitioned CTAS, INSERT INTO,
  // DELETE FROM, and SQL `VERSION AS OF` time travel — with zero path
  // literals in any query. The final frame joins the post-DML state
  // against the CTAS-version (commit_seq 0) state, so the hash proves
  // the catalog's name resolution, its write path, its DML rewrite,
  // AND its time-travel pinning in one row set; DuckDB replays the
  // mutation history relationally.
  private val graftCatalogQ = Q(
    "q_graft_catalog",
    (s, dir) => {
      val wh = scratchDir(dir, "graft_cat_wh")
      val p = new org.apache.hadoop.fs.Path(wh)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      s.conf.set("spark.sql.catalog.gql", "graft.catalog.GraftCatalog")
      s.conf.set("spark.sql.catalog.gql.warehouse", wh)
      s.sql("CREATE NAMESPACE gql.db")
      t(s, dir, "orders").createOrReplaceTempView("gcat_orders_src")
      s.sql(
        """CREATE TABLE gql.db.ord USING graft PARTITIONED BY (o_orderpriority)
          |AS SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
          |   FROM gcat_orders_src""".stripMargin)
      s.sql(
        """INSERT INTO gql.db.ord
          |SELECT -o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
          |FROM gcat_orders_src WHERE o_orderkey % 50 = 0""".stripMargin)
      s.sql("DELETE FROM gql.db.ord " +
        "WHERE o_orderkey > 0 AND o_orderkey % 10 = 3")
      s.sql(
        """SELECT cur.o_orderpriority, cur.n_cur, cur.sum_price, v0.n_v0
          |FROM (SELECT o_orderpriority, COUNT(*) AS n_cur,
          |        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          |          AS sum_price
          |      FROM gql.db.ord GROUP BY 1) cur
          |JOIN (SELECT o_orderpriority, COUNT(*) AS n_v0
          |      FROM gql.db.ord VERSION AS OF 0 GROUP BY 1) v0
          |  ON cur.o_orderpriority = v0.o_orderpriority
          |ORDER BY 1""".stripMargin)
    },
    Some(s"""WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice,
            |                     o_orderpriority FROM orders),
            |cur AS (
            |  SELECT * FROM (
            |    SELECT * FROM base
            |    UNION ALL
            |    SELECT -o_orderkey, o_orderstatus, o_totalprice,
            |           o_orderpriority
            |    FROM base WHERE o_orderkey % 50 = 0)
            |  WHERE NOT (o_orderkey > 0 AND o_orderkey % 10 = 3))
            |SELECT c.o_orderpriority, c.n_cur, c.sum_price, v.n_v0
            |FROM (SELECT o_orderpriority, COUNT(*) AS n_cur,
            |        ${oSum("o_totalprice")} AS sum_price
            |      FROM cur GROUP BY 1) c
            |JOIN (SELECT o_orderpriority, COUNT(*) AS n_v0
            |      FROM base GROUP BY 1) v
            |  ON c.o_orderpriority = v.o_orderpriority
            |ORDER BY 1""".stripMargin))

  // SCHEMA EVOLUTION under oracle (round 11): the reference's own
  // schema story is drift (its raw schema grew 4 columns the curated
  // face dropped, meta_data/raw/random_postcodes.json:167-186) — here
  // the engine's catalog face evolves through pure SQL: CTAS, `ALTER
  // TABLE ADD COLUMN`, an INSERT carrying the new column, and an
  // UPDATE that rewrites PRE-EVOLUTION files (the touched files
  // null-fill the new column inside the scan, then re-land with the
  // evolved schema). The final aggregate spans the boundary, so the
  // hash proves old rows null-fill, new rows carry values, and the DML
  // rewrite loses neither. DuckDB replays the evolution relationally.
  private val graftEvolve = Q(
    "q_graft_evolve",
    (s, dir) => {
      val wh = scratchDir(dir, "graft_evo_wh")
      val p = new org.apache.hadoop.fs.Path(wh)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      s.conf.set("spark.sql.catalog.gevo", "graft.catalog.GraftCatalog")
      s.conf.set("spark.sql.catalog.gevo.warehouse", wh)
      s.sql("CREATE NAMESPACE gevo.db")
      t(s, dir, "customer").createOrReplaceTempView("gevo_src")
      s.sql(
        """CREATE TABLE gevo.db.cust USING graft
          |AS SELECT c_custkey, c_mktsegment FROM gevo_src""".stripMargin)
      s.sql("ALTER TABLE gevo.db.cust ADD COLUMN bonus DOUBLE")
      s.sql(
        """INSERT INTO gevo.db.cust
          |SELECT -c_custkey, c_mktsegment, CAST(c_custkey AS DOUBLE) / 100
          |FROM gevo_src WHERE c_custkey % 40 = 0""".stripMargin)
      s.sql("UPDATE gevo.db.cust SET bonus = 1.5 " +
        "WHERE c_custkey > 0 AND c_custkey % 100 = 0")
      s.sql(
        """SELECT c_mktsegment, COUNT(*) AS n, COUNT(bonus) AS n_bonus,
          |  CAST(SUM(CAST(bonus AS DECIMAL(18,2))) AS DOUBLE) AS sum_bonus
          |FROM gevo.db.cust GROUP BY 1 ORDER BY 1""".stripMargin)
    },
    Some("""WITH base AS (SELECT c_custkey, c_mktsegment FROM customer),
           |evolved AS (
           |  SELECT c_custkey, c_mktsegment,
           |    CASE WHEN c_custkey > 0 AND c_custkey % 100 = 0
           |         THEN 1.5 ELSE NULL END AS bonus
           |  FROM base
           |  UNION ALL
           |  SELECT -c_custkey, c_mktsegment, CAST(c_custkey AS DOUBLE) / 100
           |  FROM base WHERE c_custkey % 40 = 0)
           |SELECT c_mktsegment, COUNT(*) AS n, COUNT(bonus) AS n_bonus,
           |  CAST(SUM(CAST(bonus AS DECIMAL(18,2))) AS DOUBLE) AS sum_bonus
           |FROM evolved GROUP BY 1 ORDER BY 1""".stripMargin))

  // PER-SNAPSHOT schema on time travel under oracle (round 12): the
  // ALTER lands as a metadata-only manifest commit whose seq keys a
  // sidecar schema-history entry, so `VERSION AS OF` a pre-evolution
  // commit reads the AS-COMMITTED schema (Delta's last-metaData-wins)
  // — proven two ways: the v0 leg's row counts join the head's evolved
  // aggregate (values must match the relational replay), and the v0
  // SELECT * column COUNT rides along as a literal (2 = the pre-ALTER
  // shape; were the head schema leaking into time travel it would read
  // 3 and the hash would miss).
  private val graftEvolveAsof = Q(
    "q_graft_evolve_asof",
    (s, dir) => {
      val wh = scratchDir(dir, "graft_evoasof_wh")
      val p = new org.apache.hadoop.fs.Path(wh)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      s.conf.set("spark.sql.catalog.geva", "graft.catalog.GraftCatalog")
      s.conf.set("spark.sql.catalog.geva.warehouse", wh)
      s.sql("CREATE NAMESPACE geva.db")
      t(s, dir, "customer").createOrReplaceTempView("geva_src")
      s.sql(
        """CREATE TABLE geva.db.cust USING graft
          |AS SELECT c_custkey, c_mktsegment FROM geva_src""".stripMargin)
      s.sql("ALTER TABLE geva.db.cust ADD COLUMN bonus DOUBLE")
      s.sql(
        """INSERT INTO geva.db.cust
          |SELECT -c_custkey, c_mktsegment, CAST(c_custkey AS DOUBLE) / 100
          |FROM geva_src WHERE c_custkey % 40 = 0""".stripMargin)
      val v0ncols =
        s.sql("SELECT * FROM geva.db.cust VERSION AS OF 0").columns.length
      s.sql(
        s"""SELECT cur.c_mktsegment, cur.n_cur, cur.sum_bonus, v0.n_v0,
           |  $v0ncols AS v0_ncols
           |FROM (SELECT c_mktsegment, COUNT(*) AS n_cur,
           |        CAST(SUM(CAST(bonus AS DECIMAL(18,2))) AS DOUBLE)
           |          AS sum_bonus
           |      FROM geva.db.cust GROUP BY 1) cur
           |JOIN (SELECT c_mktsegment, COUNT(*) AS n_v0
           |      FROM geva.db.cust VERSION AS OF 0 GROUP BY 1) v0
           |  ON cur.c_mktsegment = v0.c_mktsegment
           |ORDER BY 1""".stripMargin)
    },
    Some("""WITH base AS (SELECT c_custkey, c_mktsegment FROM customer),
           |evolved AS (
           |  SELECT c_custkey, c_mktsegment, CAST(NULL AS DOUBLE) AS bonus
           |  FROM base
           |  UNION ALL
           |  SELECT -c_custkey, c_mktsegment, CAST(c_custkey AS DOUBLE) / 100
           |  FROM base WHERE c_custkey % 40 = 0)
           |SELECT c.c_mktsegment, c.n_cur, c.sum_bonus, v.n_v0,
           |  2 AS v0_ncols
           |FROM (SELECT c_mktsegment, COUNT(*) AS n_cur,
           |        CAST(SUM(CAST(bonus AS DECIMAL(18,2))) AS DOUBLE)
           |          AS sum_bonus
           |      FROM evolved GROUP BY 1) c
           |JOIN (SELECT c_mktsegment, COUNT(*) AS n_v0
           |      FROM base GROUP BY 1) v
           |  ON c.c_mktsegment = v.c_mktsegment
           |ORDER BY 1""".stripMargin))

  // MERGE WITH SCHEMA EVOLUTION under oracle (round 12): the source
  // carries a column the target lacks; the analyzer's own
  // ResolveMergeIntoSchemaEvolution (armed by the catalog table's
  // AUTOMATIC_SCHEMA_EVOLUTION capability; the V1 swap defers while
  // needSchemaEvolution holds) drives the catalog's CAS'd ADD COLUMN,
  // then the two-phase merge upserts against the widened schema — old
  // rows null-fill, updated/inserted rows carry values, and the
  // pre-merge version still reads the narrow shape (the literal
  // v0_ncols = 2 leg would hash-miss otherwise).
  private val graftMergeEvolve = Q(
    "q_graft_merge_evolve",
    (s, dir) => {
      val wh = scratchDir(dir, "graft_mevo_wh")
      val p = new org.apache.hadoop.fs.Path(wh)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      s.conf.set("spark.sql.catalog.gmev", "graft.catalog.GraftCatalog")
      s.conf.set("spark.sql.catalog.gmev.warehouse", wh)
      s.sql("CREATE NAMESPACE gmev.db")
      t(s, dir, "customer").createOrReplaceTempView("gmev_src")
      s.sql(
        """CREATE TABLE gmev.db.cust USING graft
          |AS SELECT c_custkey, c_mktsegment FROM gmev_src""".stripMargin)
      s.sql(
        """SELECT c_custkey, c_mktsegment,
          |  CAST(c_acctbal AS DOUBLE) AS balance
          |FROM gmev_src WHERE c_custkey % 7 = 0
          |UNION ALL
          |SELECT -c_custkey, c_mktsegment,
          |  CAST(c_acctbal AS DOUBLE) AS balance
          |FROM gmev_src WHERE c_custkey % 40 = 3""".stripMargin)
        .createOrReplaceTempView("gmev_batch")
      s.sql(
        """MERGE WITH SCHEMA EVOLUTION INTO gmev.db.cust t
          |USING gmev_batch s ON t.c_custkey = s.c_custkey
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val v0ncols =
        s.sql("SELECT * FROM gmev.db.cust VERSION AS OF 0").columns.length
      s.sql(
        s"""SELECT c_mktsegment, COUNT(*) AS n, COUNT(balance) AS n_bal,
           |  CAST(SUM(CAST(balance AS DECIMAL(18,2))) AS DOUBLE)
           |    AS sum_bal,
           |  $v0ncols AS v0_ncols
           |FROM gmev.db.cust GROUP BY 1 ORDER BY 1""".stripMargin)
    },
    Some("""WITH base AS (SELECT c_custkey, c_mktsegment, c_acctbal
           |              FROM customer),
           |merged AS (
           |  SELECT b.c_custkey, b.c_mktsegment,
           |    CASE WHEN b.c_custkey % 7 = 0
           |         THEN CAST(b.c_acctbal AS DOUBLE) ELSE NULL END AS balance
           |  FROM base b
           |  UNION ALL
           |  SELECT -c_custkey, c_mktsegment, CAST(c_acctbal AS DOUBLE)
           |  FROM base WHERE c_custkey % 40 = 3)
           |SELECT c_mktsegment, COUNT(*) AS n, COUNT(balance) AS n_bal,
           |  CAST(SUM(CAST(balance AS DECIMAL(18,2))) AS DOUBLE)
           |    AS sum_bal,
           |  2 AS v0_ncols
           |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin))

  // COLUMN MAPPING under oracle (round 12): RENAME + DROP COLUMN as
  // pure metadata (Delta name mode — the physical parquet names
  // freeze; logical names live in field metadata), proven across the
  // full lifecycle: pre-rename files, a rename, a post-rename INSERT
  // under the frozen physical name, a DROP, a re-ADD of the dropped
  // name (fresh physical column — the oracle's NULLs prove the old
  // bytes never resurrect), and an aggregate by the renamed column.
  private val graftRename = Q(
    "q_graft_rename",
    (s, dir) => {
      val wh = scratchDir(dir, "graft_rename_wh")
      val p = new org.apache.hadoop.fs.Path(wh)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      s.conf.set("spark.sql.catalog.gren", "graft.catalog.GraftCatalog")
      s.conf.set("spark.sql.catalog.gren.warehouse", wh)
      s.sql("CREATE NAMESPACE gren.db")
      t(s, dir, "customer").createOrReplaceTempView("gren_src")
      s.sql(
        """CREATE TABLE gren.db.cust USING graft
          |AS SELECT c_custkey, c_mktsegment, CAST(c_acctbal AS DOUBLE)
          |   AS c_acctbal FROM gren_src""".stripMargin)
      s.sql("ALTER TABLE gren.db.cust RENAME COLUMN c_mktsegment TO segment")
      s.sql(
        """INSERT INTO gren.db.cust
          |SELECT -c_custkey, c_mktsegment, CAST(c_acctbal AS DOUBLE)
          |FROM gren_src WHERE c_custkey % 40 = 0""".stripMargin)
      s.sql("ALTER TABLE gren.db.cust DROP COLUMN c_acctbal")
      s.sql("ALTER TABLE gren.db.cust ADD COLUMN c_acctbal DOUBLE")
      s.sql(
        """SELECT segment, COUNT(*) AS n, COUNT(c_acctbal) AS n_bal,
          |  CAST(SUM(CASE WHEN c_custkey < 0 THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_neg
          |FROM gren.db.cust GROUP BY 1 ORDER BY 1""".stripMargin)
    },
    Some("""WITH base AS (SELECT c_custkey, c_mktsegment FROM customer),
           |renamed AS (
           |  SELECT c_custkey, c_mktsegment AS segment FROM base
           |  UNION ALL
           |  SELECT -c_custkey, c_mktsegment FROM base
           |  WHERE c_custkey % 40 = 0)
           |SELECT segment, COUNT(*) AS n, CAST(0 AS BIGINT) AS n_bal,
           |  CAST(SUM(CASE WHEN c_custkey < 0 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_neg
           |FROM renamed GROUP BY 1 ORDER BY 1""".stripMargin))

  // TYPE WIDENING under oracle (round 12): INT -> BIGINT and
  // DECIMAL(12,2) -> DECIMAL(18,2) as metadata-only retypes (Spark 4's
  // parquet reader upcasts the old narrow files per file), proven by
  // inserting keys no INT can hold AFTER the widening and aggregating
  // across the mixed narrow/wide file set; DuckDB replays the same
  // values relationally.
  private val graftWiden = Q(
    "q_graft_widen",
    (s, dir) => {
      val wh = scratchDir(dir, "graft_widen_wh")
      val p = new org.apache.hadoop.fs.Path(wh)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      s.conf.set("spark.sql.catalog.gwid", "graft.catalog.GraftCatalog")
      s.conf.set("spark.sql.catalog.gwid.warehouse", wh)
      s.sql("CREATE NAMESPACE gwid.db")
      t(s, dir, "customer").createOrReplaceTempView("gwid_src")
      s.sql(
        """CREATE TABLE gwid.db.cust USING graft
          |AS SELECT CAST(c_custkey AS INT) AS k, c_mktsegment,
          |   CAST(c_acctbal AS DECIMAL(12,2)) AS bal FROM gwid_src""".stripMargin)
      s.sql("ALTER TABLE gwid.db.cust ALTER COLUMN k TYPE BIGINT")
      s.sql("ALTER TABLE gwid.db.cust ALTER COLUMN bal TYPE DECIMAL(18,2)")
      s.sql(
        """INSERT INTO gwid.db.cust
          |SELECT c_custkey + 4000000000, c_mktsegment,
          |  CAST(c_acctbal AS DECIMAL(18,2))
          |FROM gwid_src WHERE c_custkey % 40 = 3""".stripMargin)
      s.sql(
        """SELECT c_mktsegment, COUNT(*) AS n,
          |  CAST(SUM(k) AS BIGINT) AS sum_k,
          |  CAST(SUM(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
          |FROM gwid.db.cust GROUP BY 1 ORDER BY 1""".stripMargin)
    },
    Some("""WITH base AS (SELECT c_custkey, c_mktsegment, c_acctbal
           |              FROM customer),
           |widened AS (
           |  SELECT c_custkey AS k, c_mktsegment, c_acctbal AS bal
           |  FROM base
           |  UNION ALL
           |  SELECT c_custkey + 4000000000, c_mktsegment, c_acctbal
           |  FROM base WHERE c_custkey % 40 = 3)
           |SELECT c_mktsegment, COUNT(*) AS n,
           |  CAST(SUM(k) AS BIGINT) AS sum_k,
           |  CAST(SUM(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
           |FROM widened GROUP BY 1 ORDER BY 1""".stripMargin))

  // graft-native INCREMENTAL READ under oracle (round 12):
  // `.option("changesSince", <snapshot>)` serves the rows ADDED after
  // the baseline — the manifest file-set difference on the vectorized
  // fast path (cost ∝ new files, the downstream-incremental-job
  // pattern) — proven by aggregating ONLY the two appended slices
  // against DuckDB's relational replay of the same slices.
  private val graftChanges = Q(
    "q_graft_changes",
    (s, dir) => {
      val out = scratchDir(dir, "graft_changes")
      val p = new org.apache.hadoop.fs.Path(out)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val o = t(s, dir, "orders")
      graft.io.Manifest.write(o.filter(col("o_orderkey") % 3 === 0),
        out, "base")
      graft.io.Manifest.append(o.filter(col("o_orderkey") % 3 === 1),
        out, "batch1")
      graft.io.Manifest.append(o.filter(col("o_orderkey") % 3 === 2),
        out, "batch2")
      s.read.format("graft").option("changesSince", "base").load(out)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum("o_orderkey").as("sum_ok"),
          dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("o_orderstatus")
    },
    Some(s"""SELECT o_orderstatus, COUNT(*) AS n,
            |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_ok,
            |  ${oSum("o_totalprice")} AS sum_price
            |FROM orders WHERE o_orderkey % 3 <> 0
            |GROUP BY 1 ORDER BY 1""".stripMargin))

  // CALL system.zorder under oracle (round 11): orders lands UNCLUSTERED
  // (hash-repartitioned — every file spans the whole key space, so
  // footer bounds prune nothing), the SQL procedure rewrites it
  // range-clustered, and the post-zorder SELECTIVE aggregate is what
  // hashes against the oracle's plain filtered scan — proving the
  // maintenance move preserves every row while making the clustered
  // read prunable (the spec asserts the numFiles drop; the oracle
  // asserts the content).
  private val graftZorder = Q(
    "q_graft_zorder",
    (s, dir) => {
      val wh = scratchDir(dir, "graft_zorder_wh")
      val p = new org.apache.hadoop.fs.Path(wh)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      s.conf.set("spark.sql.catalog.gzod", "graft.catalog.GraftCatalog")
      s.conf.set("spark.sql.catalog.gzod.warehouse", wh)
      s.sql("CREATE NAMESPACE gzod.db")
      t(s, dir, "orders").createOrReplaceTempView("gzod_src")
      s.sql(
        """CREATE TABLE gzod.db.ord USING graft
          |AS SELECT /*+ REPARTITION(8) */ o_orderkey, o_orderstatus,
          |   o_totalprice FROM gzod_src""".stripMargin)
      s.sql("CALL gzod.system.zorder(table => 'db.ord', " +
        "columns => 'o_orderkey', target_file_bytes => 262144)")
      s.sql(
        s"""SELECT o_orderstatus, COUNT(*) AS n,
           |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_ok,
           |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           |    AS sum_price
           |FROM gzod.db.ord WHERE o_orderkey BETWEEN 1000 AND 2999
           |GROUP BY 1 ORDER BY 1""".stripMargin)
    },
    Some(s"""SELECT o_orderstatus, COUNT(*) AS n,
            |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_ok,
            |  ${oSum("o_totalprice")} AS sum_price
            |FROM orders WHERE o_orderkey BETWEEN 1000 AND 2999
            |GROUP BY 1 ORDER BY 1""".stripMargin))

  // CALL system.restore under oracle (round 11): a DELETE mutates the
  // catalog table, then one SQL `CALL restore(version => 0)` rolls the
  // head back BY REFERENCE (zero data movement — the new manifest
  // lists the original files), and the post-restore aggregate is what
  // hashes against the oracle's scan of the UNTOUCHED source table.
  // Hash equality proves the rollback is exact: had the delete leaked
  // through, every group's count would differ.
  private val graftRestore = Q(
    "q_graft_restore",
    (s, dir) => {
      val wh = scratchDir(dir, "graft_restore_wh")
      val p = new org.apache.hadoop.fs.Path(wh)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      s.conf.set("spark.sql.catalog.grst", "graft.catalog.GraftCatalog")
      s.conf.set("spark.sql.catalog.grst.warehouse", wh)
      s.sql("CREATE NAMESPACE grst.db")
      t(s, dir, "orders").createOrReplaceTempView("grst_src")
      s.sql(
        """CREATE TABLE grst.db.ord USING graft
          |AS SELECT o_orderkey, o_orderstatus, o_totalprice
          |   FROM grst_src""".stripMargin)
      s.sql("DELETE FROM grst.db.ord WHERE o_orderkey % 3 = 0")
      s.sql("CALL grst.system.restore(table => 'db.ord', version => 0)")
      s.sql(
        s"""SELECT o_orderstatus, COUNT(*) AS n,
           |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_ok,
           |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           |    AS sum_price
           |FROM grst.db.ord GROUP BY 1 ORDER BY 1""".stripMargin)
    },
    Some(s"""SELECT o_orderstatus, COUNT(*) AS n,
            |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_ok,
            |  ${oSum("o_totalprice")} AS sum_price
            |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin))

  // Partition-scoped OPTIMIZE under oracle (round 11): orders lands
  // hive-partitioned with a deliberate small-file spray (REPARTITION
  // hint), one SQL `CALL compact(where_partition => ...)` rewrites
  // ONLY the hot partition (everything else carries by reference —
  // the spec proves the file-level split), and the full-table
  // aggregate hashes against the untouched source — proving the scoped
  // maintenance move loses and duplicates nothing.
  private val graftOptimize = Q(
    "q_graft_optimize",
    (s, dir) => {
      val wh = scratchDir(dir, "graft_optw_wh")
      val p = new org.apache.hadoop.fs.Path(wh)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      s.conf.set("spark.sql.catalog.gopt", "graft.catalog.GraftCatalog")
      s.conf.set("spark.sql.catalog.gopt.warehouse", wh)
      s.sql("CREATE NAMESPACE gopt.db")
      t(s, dir, "orders").createOrReplaceTempView("gopt_src")
      s.sql(
        """CREATE TABLE gopt.db.ord USING graft
          |PARTITIONED BY (o_orderpriority)
          |AS SELECT /*+ REPARTITION(4) */ o_orderkey, o_orderstatus,
          |   o_totalprice, o_orderpriority FROM gopt_src""".stripMargin)
      s.sql("CALL gopt.system.compact(table => 'db.ord', " +
        "where_partition => 'o_orderpriority=1-URGENT')")
      s.sql(
        s"""SELECT o_orderpriority, COUNT(*) AS n,
           |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_ok,
           |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           |    AS sum_price
           |FROM gopt.db.ord GROUP BY 1 ORDER BY 1""".stripMargin)
    },
    Some(s"""SELECT o_orderpriority, COUNT(*) AS n,
            |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_ok,
            |  ${oSum("o_totalprice")} AS sum_price
            |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin))

  val all: Seq[Q] = Seq(mergeUpsert, mergeDelete, scd2, scd2Lookup, zorder, dsv2Source,
    avroRoundtrip, avroSourceV2Q, deltaExport, icebergExport,
    icebergIncremental, icebergRefs,
    deltaSkipping, icebergStats, cowDelete, cowUpdate, morDelete, icebergMorRead,
    deltaDvRead,
    partitionedRead, deltaPartitionPrune,
    graftSourceQ, graftAsof, graftSink, graftStream, graftStreamSink,
    deltaCdf,
    graftSqlDelete, graftSubqDelete, graftCorrDml, graftCorrUpdateSet,
    graftMerge, graftCatalogQ,
    graftEvolve,
    graftEvolveAsof, graftMergeEvolve, graftRename, graftWiden, graftChanges,
    graftCdf, graftMorDml,
    graftZorder,
    graftRestore, graftOptimize,
    httpSource,
    ewmaQ, eventsAnomaly, statsMoments, crossJoin, incrRollup,
    argminSupplier, resampleFfill, resampleLerp, notInNull, distinctSketch,
    kmvDistinct, kmvRollupQ, kmvSetOpsQ, bitmapDistinct, regression, winsorize, argExtremum,
    snapshotDiff, profileQ, constraintsQ)
}
