package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.ops.{Sampling, Skew, Skyline}
import QueryUtil._

/**
 * Analytics wave: pivot, moment statistics, deterministic sampling.
 * Statistics use the exact-decimal-sums pattern: Σx, Σx², Σxy are exact
 * DECIMAL sums (order-independent), surfaced as doubles, and the moment
 * formulas are spelled with the SAME operation order on both engines —
 * identical IEEE inputs and identical expression trees give identical
 * doubles, so even stddev/corr hash-match an oracle.
 */
object Analytics {

  private val pivotQ = Q(
    "q_pivot",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_linestatus")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).cast(DoubleType))
        .orderBy("l_linestatus"),
    Some("""SELECT l_linestatus,
           |  CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "A",
           |  CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "N",
           |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "R"
           |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin))

  private val statsExact = Q(
    "q_stats_exact",
    (s, dir) => {
      val d2 = DecimalType(18, 2)
      val li = t(s, dir, "lineitem")
      val agg = li.groupBy("l_returnflag").agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast(d2)).cast(DoubleType).as("sx"),
        sum((col("l_quantity").cast(d2) * col("l_quantity").cast(d2))).cast(DoubleType).as("sxx"),
        sum(col("l_extendedprice").cast(d2)).cast(DoubleType).as("sy"),
        sum((col("l_extendedprice").cast(d2) * col("l_extendedprice").cast(d2))).cast(DoubleType).as("syy"),
        sum((col("l_quantity").cast(d2) * col("l_extendedprice").cast(d2))).cast(DoubleType).as("sxy"))
      val n = col("n").cast(DoubleType)
      // multi-product expressions (a*b - c*d) can differ by one ulp across
      // engines when one fuses multiply-add — round those to 9 dp; plain
      // divisions (mean) stay bit-exact unrounded
      agg.select(
        col("l_returnflag"),
        col("n"),
        (col("sx") / n).as("mean_qty"),
        round((n * col("sxx") - col("sx") * col("sx")) / (n * (n - lit(1.0))), 9).as("var_qty"),
        round(sqrt((n * col("sxx") - col("sx") * col("sx")) / (n * (n - lit(1.0)))), 9).as("stddev_qty"),
        round((n * col("sxy") - col("sx") * col("sy"))
          / (sqrt(n * col("sxx") - col("sx") * col("sx"))
            * sqrt(n * col("syy") - col("sy") * col("sy"))), 9).as("corr_qty_price"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag, n0 AS n,
           |  sx / n AS mean_qty,
           |  round((n * sxx - sx * sx) / (n * (n - 1.0)), 9) AS var_qty,
           |  round(sqrt((n * sxx - sx * sx) / (n * (n - 1.0))), 9) AS stddev_qty,
           |  round((n * sxy - sx * sy)
           |    / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 9) AS corr_qty_price
           |FROM (
           |  SELECT l_returnflag, COUNT(*) AS n0, CAST(COUNT(*) AS DOUBLE) AS n,
           |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
           |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
           |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
           |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
           |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
           |  FROM lineitem GROUP BY l_returnflag)
           |ORDER BY l_returnflag""".stripMargin))

  private val sampleMod = Q(
    "q_sample_mod",
    (s, dir) =>
      // deterministic 10% "sample": portable mod filter (a seeded
      // df.sample is engine-specific RNG, so it cannot be oracle-checked)
      t(s, dir, "orders")
        .filter(pmod(col("o_orderkey"), lit(10)) === 0)
        .select("o_orderkey", "o_custkey", "o_orderstatus")
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
           |WHERE o_orderkey % 10 = 0 ORDER BY o_orderkey""".stripMargin))

  private val sampleStratified = Q(
    "q_sample_stratified",
    (s, dir) =>
      // fixed-size per-stratum sample (20 docs per language) ordered by a
      // content hash — the corpus-mixing primitive, deterministic across
      // engines (md5 hex is portable where engine RNG is not)
      Sampling.stratifiedSample(
        t(s, dir, "documents").select("doc_id", "lang", "source"),
        strataCols = Seq("lang"), n = 20, keyCol = "doc_id")
        .select("lang", "sample_rank", "doc_id", "source")
        .orderBy("lang", "sample_rank"),
    Some("""SELECT lang, sample_rank, doc_id, source FROM (
           |  SELECT lang, doc_id, source,
           |    CAST(row_number() OVER (
           |      PARTITION BY lang
           |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INTEGER) AS sample_rank
           |  FROM documents)
           |WHERE sample_rank <= 20 ORDER BY lang, sample_rank""".stripMargin))

  private val saltedJoin = Q(
    "q_salted_join",
    (s, dir) => {
      // the skew-salting rewrite must be semantically invisible: its
      // oracle is the PLAIN join SQL, so the hash-match proves equivalence
      val li = t(s, dir, "lineitem")
      val n = t(s, dir, "nation")
      val withNation = li.withColumn("nk", pmod(col("l_suppkey"), lit(25)).cast("int"))
      Skew.saltedJoin(withNation, n.withColumnRenamed("n_nationkey", "nk"),
        key = "nk", buckets = 8, saltBy = Seq("l_orderkey", "l_linenumber"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("n_name")
    },
    Some(s"""SELECT n_name, COUNT(*) AS n_items, ${oSum("l_quantity")} AS sum_qty
            |FROM lineitem JOIN nation ON CAST(l_suppkey % 25 AS INTEGER) = n_nationkey
            |GROUP BY n_name ORDER BY n_name""".stripMargin))

  private val histogram = Q(
    "q_histogram",
    (s, dir) =>
      // fixed-width histogram: floor-of-division bucketing is portable
      // (double division then floor is bit-identical across engines)
      t(s, dir, "lineitem")
        .withColumn("bucket", floor(col("l_extendedprice") / 10000).cast("long"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy("bucket"),
    Some(s"""SELECT CAST(floor(l_extendedprice / 10000) AS BIGINT) AS bucket,
            |  COUNT(*) AS n, ${oSum("l_extendedprice")} AS sum_price
            |FROM lineitem GROUP BY 1 ORDER BY bucket""".stripMargin))

  private val rangeJoinBinned = Q(
    "q_range_join_binned",
    (s, dir) => {
      // pure interval join (no equi-key): which lineitems ship inside each
      // sampled order's 90-day window. The binned rewrite must be
      // semantically invisible — the oracle is the PLAIN range join.
      val win = t(s, dir, "orders")
        .filter(pmod(col("o_orderkey"), lit(1000)) === 0)
        .select(col("o_orderkey"),
          datediff(to_date(col("o_orderdate")), lit("1970-01-01")).cast("long").as("lo"))
        .withColumn("hi", col("lo") + 90)
      val li = t(s, dir, "lineitem")
        .select(datediff(to_date(col("l_shipdate")), lit("1970-01-01")).cast("long").as("d"),
          col("l_quantity"))
      graft.ops.RangeJoin.binnedRangeJoin(li, win, "d", "lo", "hi", binWidth = 90L)
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("o_orderkey")
    },
    Some(s"""SELECT o_orderkey, COUNT(*) AS n, ${oSum("l_quantity")} AS sum_qty
            |FROM (SELECT o_orderkey,
            |        date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS lo
            |      FROM orders WHERE o_orderkey % 1000 = 0) w
            |JOIN (SELECT date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS d,
            |        l_quantity
            |      FROM lineitem) l
            |  ON l.d BETWEEN w.lo AND w.lo + 90
            |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin))

  // Interval×interval overlap join, binned: which same-customer order
  // pairs have overlapping 7-day fulfillment windows. The two-sided band
  // join — canonical-bin attribution emits each pair once with NO dedup
  // shuffle; the oracle is the PLAIN overlap self-join, so the hash match
  // proves the rewrite invisible.
  private val intervalJoin = Q(
    "q_interval_join",
    (s, dir) => {
      val o = t(s, dir, "orders")
      def win(pfx: String) = o.select(
        col("o_custkey").as("ck"),
        col("o_orderkey").as(s"${pfx}_key"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01")).cast("long").as(s"${pfx}_lo"))
        .withColumn(s"${pfx}_hi", col(s"${pfx}_lo") + 7)
      graft.ops.RangeJoin.binnedIntervalJoin(
        win("a"), win("b"), Seq("ck"), "a_lo", "a_hi", "b_lo", "b_hi", binWidth = 8L)
        .filter(col("a_key") < col("b_key"))
        .select(col("ck"), col("a_key"), col("b_key"),
          (least(col("a_hi"), col("b_hi")) - greatest(col("a_lo"), col("b_lo")) + 1)
            .as("overlap_days"))
        .orderBy("ck", "a_key", "b_key")
    },
    Some("""WITH w AS (
           |  SELECT o_custkey AS ck, o_orderkey AS k,
           |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS lo,
           |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) + 7 AS hi
           |  FROM orders)
           |SELECT a.ck, a.k AS a_key, b.k AS b_key,
           |  LEAST(a.hi, b.hi) - GREATEST(a.lo, b.lo) + 1 AS overlap_days
           |FROM w a JOIN w b
           |  ON a.ck = b.ck AND a.k < b.k AND a.lo <= b.hi AND b.lo <= a.hi
           |ORDER BY a.ck, a_key, b_key""".stripMargin))

  // Rolling median (trailing-7-row, nearest-rank): exact sliding-window
  // percentile via sorted frame collect — per-row cost bounded by the
  // FRAME length (7), not the partition, so it scales as O(n·w log w)
  // per key with one shuffle+sort. Nearest-rank, not interpolated:
  // engine-divergent interpolation under casts is the known trap.
  private val rollingMedian = Q(
    "q_rolling_median",
    (s, dir) => {
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(dsum(col("o_totalprice")).as("rev"))
      val w = org.apache.spark.sql.expressions.Window.orderBy("day")
        .rowsBetween(-6, org.apache.spark.sql.expressions.Window.currentRow)
      daily
        .withColumn("frame", sort_array(collect_list(col("rev")).over(w)))
        .select(col("day"), col("rev"),
          // Spark `/` on ints is DOUBLE division — truncate back to the
          // integer rank (floor ≡ DuckDB's `//` on positives)
          element_at(col("frame"),
            ((size(col("frame")) + 1) / 2).cast("int")).as("rev_med7"))
        .orderBy("day")
    },
    Some(s"""WITH daily AS (
            |  SELECT CAST(o_orderdate AS DATE) AS day, ${oSum("o_totalprice")} AS rev
            |  FROM orders GROUP BY 1)
            |SELECT day, rev,
            |  list_sort(frame)[(len(frame) + 1) // 2] AS rev_med7
            |FROM (
            |  SELECT day, rev,
            |    array_agg(rev) OVER (ORDER BY day
            |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS frame
            |  FROM daily)
            |ORDER BY day""".stripMargin))

  // Equi-DEPTH histogram (quantile bucketing): the boundary table a CBO
  // or feature-binner consumes. NOT the row-level global ntile (which
  // single-threads a full sort of the fact table): the same result is
  // exact from per-distinct-VALUE counts — bucket b covers fixed global
  // row indexes [lo_b, hi_b] (ntile's fill rule), and its min/max are
  // the values whose cumulative-count range covers those indexes. The
  // cumulative count over distinct values is the DISTRIBUTED two-pass
  // prefix sum (ops/PrefixSum) — no zero-partition window anywhere, so
  // the plan survives a continuous column where |distinct| ≈ |rows|.
  // The oracle IS the row-level ntile, so the hash match proves the
  // rewrite.
  private val histogramEqd = Q(
    "q_histogram_eqdepth",
    (s, dir) => {
      val nb = 8
      // the distinct-value frame feeds 3 PrefixSum passes (quantile
      // bounds, range totals, final window) and the cum frame feeds the
      // lo/hi bucket joins + the total — bounded-cache both or the
      // lineitem scan+aggregate reruns six times
      val counts = graft.ops.BoundedCache.cached(
        t(s, dir, "lineitem")
          .select(col("l_extendedprice").cast(DecimalType(18, 2)).as("v"))
          .groupBy("v").agg(count(lit(1)).as("c")))
      val cum = graft.ops.BoundedCache.cached(
        graft.ops.PrefixSum.runningSum(counts, "v", "c", "hi_cum")
          .withColumn("lo_cum", col("hi_cum") - col("c") + 1))
      val total = counts.agg(sum(col("c")).as("nn"))
      // ntile fill rule: first (N mod nb) buckets get ⌈N/nb⌉ rows
      val buckets = s.range(1, nb + 1).toDF("bucket")
        .crossJoin(broadcast(total))
        .withColumn("base", expr(s"nn DIV $nb"))
        .withColumn("rem", expr(s"nn % $nb"))
        .withColumn("lo_b", (col("bucket") - 1) * col("base")
          + least(col("bucket") - 1, col("rem")) + 1)
        .withColumn("n", col("base") + when(col("bucket") <= col("rem"), 1L).otherwise(0L))
        .withColumn("hi_b", col("lo_b") + col("n") - 1)
      val lo = broadcast(buckets).join(cum,
          col("lo_b").between(col("lo_cum"), col("hi_cum")))
        .select(col("bucket"), col("v").as("lov"))
      val hi = broadcast(buckets).join(cum,
          col("hi_b").between(col("lo_cum"), col("hi_cum")))
        .select(col("bucket").as("bucket2"), col("v").as("hiv"))
      buckets.join(lo, "bucket").join(hi, col("bucket") === col("bucket2"))
        .select(col("bucket").cast("int").as("bucket"), col("n"),
          col("lov").cast("double").as("lo"), col("hiv").cast("double").as("hi"))
        .orderBy("bucket")
    },
    Some("""SELECT bucket, COUNT(*) AS n,
           |  CAST(MIN(v) AS DOUBLE) AS lo, CAST(MAX(v) AS DOUBLE) AS hi
           |FROM (
           |  SELECT CAST(l_extendedprice AS DECIMAL(18,2)) AS v,
           |    CAST(ntile(8) OVER (ORDER BY CAST(l_extendedprice AS DECIMAL(18,2)),
           |      l_orderkey, l_linenumber) AS INTEGER) AS bucket
           |  FROM lineitem)
           |GROUP BY bucket ORDER BY bucket""".stripMargin))

  // Quantile feature bucketizer — FIT (edges from exact integer cumulative
  // counts: edge_i = min v with hi_cum·nb ≥ i·N, all-integer predicate so
  // no fraction ever rounds) + TRANSFORM (bucket = 1 + #edges below the
  // value). Unlike ntile (q_histogram_eqdepth) equal values NEVER split
  // across buckets — the property a feature pipeline needs. Assignment is
  // computed per DISTINCT value with the 3-row edge table broadcast; rows
  // only ever aggregate.
  private val featureBucketize = Q(
    "q_feature_bucketize",
    (s, dir) => {
      val nb = 4
      val cum = t(s, dir, "lineitem")
        .select(col("l_quantity").cast("long").as("v"))
        .groupBy("v").agg(count(lit(1)).as("c"))
        .withColumn("hi_cum", sum(col("c")).over(
          org.apache.spark.sql.expressions.Window.orderBy("v")
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
              org.apache.spark.sql.expressions.Window.currentRow)))
      val tot = cum.agg(sum(col("c")).as("nn"))
      val edges = s.range(1, nb).toDF("i").crossJoin(broadcast(tot))
        .join(cum, col("hi_cum") * nb >= col("i") * col("nn"))
        .groupBy("i").agg(min(col("v")).as("e"))
      cum.join(broadcast(edges), col("v") > col("e"), "left")
        .groupBy("v", "c").agg(count(col("e")).as("__nb"))
        .withColumn("bucket", (col("__nb") + 1).cast("int"))
        .groupBy("bucket")
        .agg(sum(col("c")).as("n"), min(col("v")).as("lo"), max(col("v")).as("hi"))
        .orderBy("bucket")
    },
    Some("""WITH v AS (SELECT CAST(l_quantity AS BIGINT) AS v FROM lineitem),
           |cum AS (SELECT v, COUNT(*) AS c,
           |  SUM(COUNT(*)) OVER (ORDER BY v) AS hi_cum FROM v GROUP BY v),
           |tot AS (SELECT SUM(c) AS nn FROM cum),
           |edges AS (
           |  SELECT i, MIN(v) AS e
           |  FROM (SELECT unnest([1, 2, 3]) AS i) CROSS JOIN tot JOIN cum
           |    ON hi_cum * 4 >= i * nn
           |  GROUP BY i),
           |vb AS (
           |  SELECT c.v, c.c, CAST(1 + COUNT(e) AS INTEGER) AS bucket
           |  FROM cum c LEFT JOIN edges ON c.v > edges.e
           |  GROUP BY c.v, c.c)
           |SELECT bucket, CAST(SUM(c) AS BIGINT) AS n, MIN(v) AS lo, MAX(v) AS hi
           |FROM vb GROUP BY bucket ORDER BY bucket""".stripMargin))

  // RFM segmentation — the classic BI composite: per-customer recency /
  // frequency / monetary, each quintiled by the EXACT integer fill rule
  // of q_feature_bucketize (equal values never split buckets) with the
  // cumulative counts on the DISTRIBUTED prefix sum (monetary has
  // ≈|customers| distinct values — a bare cumulative window would
  // single-thread it), then the 5×5×5 segment rollup with exact-decimal
  // average spend. Quintile 1 = lowest value (so r_q 1 = most recent).
  private val rfm = Q(
    "q_rfm",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val mx = o.agg(max(to_date(col("o_orderdate"))).as("mxd"))
      val base = graft.ops.BoundedCache.cached(
        o.groupBy("o_custkey").agg(
            max(to_date(col("o_orderdate"))).as("lastd"),
            count(lit(1)).as("f"),
            sum(col("o_totalprice").cast(DecimalType(18, 2))).as("m0"))
          .crossJoin(broadcast(mx))
          .select(col("o_custkey"),
            datediff(col("mxd"), col("lastd")).cast("long").as("r"),
            col("f"), col("m0").cast(DecimalType(18, 2)).as("m")))
      val tot = base.agg(count(lit(1)).as("nn"))
      def quintile(f: String) = {
        val cum = graft.ops.PrefixSum.runningSum(
          base.groupBy(f).agg(count(lit(1)).as("c")), f, "c", "hi")
        val edges = s.range(1, 5).toDF("i").crossJoin(broadcast(tot))
          .join(cum, col("hi") * 5 >= col("i") * col("nn"))
          .groupBy("i").agg(min(col(f)).as("e"))
        base.select(col("o_custkey"), col(f))
          .join(broadcast(edges), col(f) > col("e"), "left")
          .groupBy(col("o_custkey"))
          .agg(count(col("e")).as("__q"))
          .select(col("o_custkey"), (col("__q") + 1).cast("int").as(s"${f}_q"))
      }
      base.join(quintile("r"), "o_custkey")
        .join(quintile("f"), "o_custkey")
        .join(quintile("m"), "o_custkey")
        .groupBy("r_q", "f_q", "m_q")
        .agg(count(lit(1)).as("n_customers"),
          round(sum(col("m")).cast("double") / count(lit(1)), 6).as("avg_spend"))
        .orderBy("r_q", "f_q", "m_q")
    },
    Some {
      def oQuintile(f: String) =
        s"""cum_$f AS (
           |  SELECT $f AS v, COUNT(*) AS c,
           |    SUM(COUNT(*)) OVER (ORDER BY $f) AS hi
           |  FROM base GROUP BY 1),
           |edges_$f AS (
           |  SELECT i, MIN(v) AS e
           |  FROM (SELECT unnest([1, 2, 3, 4]) AS i) CROSS JOIN tot
           |  JOIN cum_$f ON hi * 5 >= i * nn
           |  GROUP BY i),
           |q_$f AS (
           |  SELECT b.o_custkey, CAST(1 + COUNT(e) AS INTEGER) AS ${f}_q
           |  FROM base b LEFT JOIN edges_$f ON b.$f > edges_$f.e
           |  GROUP BY b.o_custkey)""".stripMargin
      s"""WITH mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS mxd FROM orders),
         |base AS (
         |  SELECT o_custkey,
         |    CAST(mxd - MAX(CAST(o_orderdate AS DATE)) AS BIGINT) AS r,
         |    CAST(COUNT(*) AS BIGINT) AS f,
         |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m
         |  FROM orders CROSS JOIN mx GROUP BY o_custkey, mxd),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM base),
         |${oQuintile("r")},
         |${oQuintile("f")},
         |${oQuintile("m")}
         |SELECT r_q, f_q, m_q, CAST(COUNT(*) AS BIGINT) AS n_customers,
         |  round(CAST(SUM(m) AS DOUBLE) / COUNT(*), 6) AS avg_spend
         |FROM base
         |JOIN q_r USING (o_custkey) JOIN q_f USING (o_custkey)
         |JOIN q_m USING (o_custkey)
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
    })

  // Deterministic MODE aggregate: most frequent quantity per return flag,
  // ties to the smallest value — a ranked window over the count frame,
  // never a full sort of rows.
  private val modeQ = Q(
    "q_mode",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("l_returnflag").orderBy(col("cnt").desc, col("v"))
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_quantity").cast("long").as("v"))
        .groupBy("l_returnflag", "v").agg(count(lit(1)).as("cnt"))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("l_returnflag"), col("v").as("mode_qty"), col("cnt"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag, mode_qty, cnt FROM (
           |  SELECT l_returnflag, v AS mode_qty, cnt,
           |    row_number() OVER (PARTITION BY l_returnflag
           |      ORDER BY cnt DESC, v) AS rn
           |  FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS v, COUNT(*) AS cnt
           |        FROM lineitem GROUP BY 1, 2))
           |WHERE rn = 1 ORDER BY l_returnflag""".stripMargin))

  // Key-skew diagnosis — the census run BEFORE choosing salting or
  // relying on AQE skew splits (ops/Skew, the AQE plan spec): per join
  // key, cardinality, hottest-key share, and max/avg ratio from exact
  // integer counts, one row per candidate key column.
  private val skewProfile = Q(
    "q_skew_profile",
    (s, dir) => {
      def profile(df: org.apache.spark.sql.DataFrame, label: String, key: String) = {
        val counts = df.groupBy(col(key).as("k"))
          .agg(count(lit(1)).as("c"))
        counts.agg(
          count(lit(1)).as("n_keys"), sum(col("c")).as("total"),
          max(col("c")).as("max_cnt"))
          .select(lit(label).as("key_col"),
            col("n_keys"), col("total"), col("max_cnt"),
            // max/avg = max·n/total: integer inputs, ONE double division
            (col("max_cnt").cast("double") * col("n_keys")
              / col("total")).as("skew_ratio"))
      }
      profile(t(s, dir, "lineitem"), "lineitem.l_suppkey", "l_suppkey")
        .unionByName(profile(t(s, dir, "orders"), "orders.o_custkey", "o_custkey"))
        .unionByName(profile(events(s, dir), "events.user_id", "user_id"))
        .orderBy("key_col")
    },
    Some("""SELECT key_col, n_keys, CAST(total AS BIGINT) AS total, max_cnt,
           |  CAST(max_cnt AS DOUBLE) * n_keys / total AS skew_ratio
           |FROM (
           |  SELECT 'lineitem.l_suppkey' AS key_col, COUNT(*) AS n_keys,
           |    SUM(c) AS total, MAX(c) AS max_cnt
           |  FROM (SELECT l_suppkey, COUNT(*) AS c FROM lineitem GROUP BY 1)
           |  UNION ALL
           |  SELECT 'orders.o_custkey', COUNT(*), SUM(c), MAX(c)
           |  FROM (SELECT o_custkey, COUNT(*) AS c FROM orders GROUP BY 1)
           |  UNION ALL
           |  SELECT 'events.user_id', COUNT(*), SUM(c), MAX(c)
           |  FROM (SELECT user_id, COUNT(*) AS c FROM events GROUP BY 1))
           |ORDER BY key_col""".stripMargin))

  private val topkHeap = Q(
    "q_topk_heap",
    (s, dir) =>
      // bounded-heap grouped top-k: shuffle carries |groups|*k partial
      // buffers, not every row into a per-group sort. Oracle = the window
      // formulation, so the hash match proves semantic equivalence.
      graft.ops.TopK.topKPerGroup(
        t(s, dir, "customer"), Seq("c_nationkey"), "c_custkey", "c_acctbal", k = 3)
        .orderBy("c_nationkey", "rank"),
    Some("""SELECT c_nationkey, CAST(rn AS INTEGER) AS rank,
           |  CAST(c_custkey AS BIGINT) AS c_custkey, c_acctbal
           |FROM (SELECT c_nationkey, c_custkey, c_acctbal,
           |        row_number() OVER (PARTITION BY c_nationkey
           |          ORDER BY c_acctbal DESC, c_custkey) AS rn
           |      FROM customer)
           |WHERE rn <= 3 ORDER BY c_nationkey, rank""".stripMargin))


  // Cohort retention: users grouped by first-activity day, counted as
  // active per day-offset — the product-analytics retention triangle.
  // Two shuffles total (per-user min, then distinct per cell).
  private val cohortRetention = Q(
    "q_cohort_retention",
    (s, dir) => {
      val ev = events(s, dir)
        .select(col("user_id"), expr("ts DIV 86400000000000").as("day"))
      val cohorts = ev.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
      ev.join(cohorts, "user_id")
        .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
        .agg(countDistinct(col("user_id")).as("active_users"))
        .orderBy("cohort_day", "day_offset")
    },
    Some("""WITH ev AS (
           |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day FROM events),
           |cohorts AS (
           |  SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY user_id)
           |SELECT cohort_day, day - cohort_day AS day_offset,
           |       COUNT(DISTINCT user_id) AS active_users
           |FROM ev JOIN cohorts USING (user_id)
           |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin))

  // First-touch / last-touch attribution: the earliest and latest
  // non-purchase event type before each user's first purchase, counted as
  // acquisition paths. Windows ordered (ts, event_id) for determinism.
  private val attribution = Q(
    "q_attribution",
    (s, dir) => {
      val ev = events(s, dir).select(col("user_id"), col("event_id"),
        col("ts"), col("event_type"))
      val firstPurchase = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(min(col("ts")).as("fp_ts"))
      val pre = ev.join(firstPurchase, "user_id")
        .filter(col("ts") < col("fp_ts") && col("event_type") =!= "purchase")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val touched = pre
        .withColumn("first_touch", first(col("event_type")).over(w))
        .withColumn("last_touch", last(col("event_type")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.unboundedFollowing)))
        .select("user_id", "first_touch", "last_touch").distinct()
      touched.groupBy("first_touch", "last_touch")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("first_touch", "last_touch")
    },
    Some("""WITH fp AS (
           |  SELECT user_id, MIN(ts) AS fp_ts FROM events
           |  WHERE event_type = 'purchase' GROUP BY user_id),
           |pre AS (
           |  SELECT e.user_id, e.event_type, e.ts, e.event_id
           |  FROM events e JOIN fp USING (user_id)
           |  WHERE e.ts < fp.fp_ts AND e.event_type <> 'purchase'),
           |touched AS (
           |  SELECT DISTINCT user_id,
           |    first_value(event_type) OVER (PARTITION BY user_id
           |      ORDER BY ts, event_id) AS first_touch,
           |    last_value(event_type) OVER (PARTITION BY user_id
           |      ORDER BY ts, event_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_touch
           |  FROM pre)
           |SELECT first_touch, last_touch, COUNT(*) AS n_users
           |FROM touched GROUP BY 1, 2 ORDER BY first_touch, last_touch""".stripMargin))

  // Share-of-total: each nation's revenue share within its region. The
  // window total stays DECIMAL (order-independent) until the final
  // double division — a float window sum would be partition-order-
  // dependent and break the hash.
  private val shareOfTotal = Q(
    "q_share_of_total",
    (s, dir) => {
      val rev = t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("rev_dec"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("r_name")
      rev
        .withColumn("share",
          round(col("rev_dec").cast(DoubleType) / sum(col("rev_dec")).over(w).cast(DoubleType), 9))
        .select(col("r_name"), col("n_name"),
          col("rev_dec").cast(DoubleType).as("rev"), col("share"))
        .orderBy("r_name", "n_name")
    },
    Some("""WITH rev AS (
           |  SELECT r_name, n_name,
           |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
           |  FROM orders
           |  JOIN customer ON o_custkey = c_custkey
           |  JOIN nation ON c_nationkey = n_nationkey
           |  JOIN region ON n_regionkey = r_regionkey
           |  GROUP BY r_name, n_name)
           |SELECT r_name, n_name, CAST(rev_dec AS DOUBLE) AS rev,
           |       round(CAST(rev_dec AS DOUBLE) /
           |             CAST(SUM(rev_dec) OVER (PARTITION BY r_name) AS DOUBLE), 9) AS share
           |FROM rev ORDER BY r_name, n_name""".stripMargin))

  // Behavior transition matrix: within each user's event stream (ordered
  // by ts, event_id), count consecutive event-type bigrams — the Markov
  // transition counts behind next-event models. One shuffle (the window),
  // then a tiny aggregate.
  private val eventTransitions = Q(
    "q_event_transitions",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      events(s, dir)
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type").as("from_type"), col("event_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy("from_type", "to_type")
    },
    Some("""SELECT prev_type AS from_type, event_type AS to_type, COUNT(*) AS n
           |FROM (SELECT event_type,
           |        lag(event_type) OVER (PARTITION BY user_id
           |          ORDER BY ts, event_id) AS prev_type
           |      FROM events)
           |WHERE prev_type IS NOT NULL
           |GROUP BY 1, 2 ORDER BY from_type, to_type""".stripMargin))

  // ABC / Pareto classification: parts ranked by revenue, cumulative
  // share (exact decimal running sum / exact decimal total) cut at
  // 60%/90% — the inventory-curation shape. The running sum stays
  // DECIMAL until the final double division, so the class boundaries are
  // engine-identical.
  private val abcClass = Q(
    "q_abc_class",
    (s, dir) => {
      val rev = t(s, dir, "lineitem")
        .groupBy("l_partkey")
        .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2))).as("rev_dec"))
      // the global running sum is inherently one ordered pass, but it
      // runs over |parts| aggregated rows, not |lineitem| rows — and the
      // grand total is a broadcast scalar, not a second all-rows window
      val wRun = org.apache.spark.sql.expressions.Window
        .orderBy(col("rev_dec").desc, col("l_partkey"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val total = rev.agg(sum(col("rev_dec")).as("total_dec"))
      val share = sum(col("rev_dec")).over(wRun).cast(DoubleType) /
        col("total_dec").cast(DoubleType)
      rev.crossJoin(broadcast(total))
        .withColumn("abc",
          when(share <= 0.6, "A").when(share <= 0.9, "B").otherwise("C"))
        .groupBy("abc")
        .agg(count(lit(1)).as("n_parts"),
          sum(col("rev_dec")).cast(DoubleType).as("revenue"))
        .orderBy("abc")
    },
    Some("""WITH rev AS (
           |  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev_dec
           |  FROM lineitem GROUP BY 1),
           |ranked AS (
           |  SELECT l_partkey, rev_dec,
           |    CAST(SUM(rev_dec) OVER (ORDER BY rev_dec DESC, l_partkey
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) /
           |    CAST(SUM(rev_dec) OVER () AS DOUBLE) AS share
           |  FROM rev)
           |SELECT CASE WHEN share <= 0.6 THEN 'A'
           |            WHEN share <= 0.9 THEN 'B' ELSE 'C' END AS abc,
           |  COUNT(*) AS n_parts, CAST(SUM(rev_dec) AS DOUBLE) AS revenue
           |FROM ranked GROUP BY 1 ORDER BY abc""".stripMargin))

  // Gaps-and-islands: longest run of consecutive ACTIVE DAYS per event
  // type. day − dense_rank(day) is constant within a consecutive run —
  // the classic islands key — then one aggregate per island and a max.
  private val gapsIslands = Q(
    "q_gaps_islands",
    (s, dir) => {
      val daily = events(s, dir)
        .select(col("event_type"), expr("ts DIV 86400000000000").as("day"))
        .distinct()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("day")
      val islands = daily
        .withColumn("grp", col("day") - dense_rank().over(w))
        .groupBy("event_type", "grp")
        .agg(count(lit(1)).as("len"), min("day").as("start_day"))
      islands.groupBy("event_type")
        .agg(max(struct(col("len"), col("start_day"))).as("best"))
        .select(col("event_type"), col("best.len").as("longest_streak"),
          col("best.start_day").as("streak_start"))
        .orderBy("event_type")
    },
    Some("""WITH daily AS (
           |  SELECT DISTINCT event_type, epoch_ns(ts) // 86400000000000 AS day
           |  FROM events),
           |islands AS (
           |  SELECT event_type,
           |    day - dense_rank() OVER (PARTITION BY event_type ORDER BY day) AS grp,
           |    day
           |  FROM daily),
           |runs AS (
           |  SELECT event_type, grp, COUNT(*) AS len, MIN(day) AS start_day
           |  FROM islands GROUP BY 1, 2)
           |SELECT event_type, len AS longest_streak, start_day AS streak_start
           |FROM (SELECT event_type, len, start_day,
           |        row_number() OVER (PARTITION BY event_type
           |          ORDER BY len DESC, start_day DESC) AS rn
           |      FROM runs)
           |WHERE rn = 1 ORDER BY event_type""".stripMargin))

  // Median absolute deviation — the robust dispersion measure: exact
  // per-group median, then the median of absolute deviations from it
  // (both engines' exact quantile interpolation is bit-identical, the
  // q_median precedent).
  private val madQ = Q(
    "q_mad",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val med = li.groupBy("l_returnflag")
        .agg(expr("percentile(l_quantity, 0.5)").as("med"))
      li.join(broadcast(med), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(first(col("med")).as("median_qty"),
          expr("percentile(abs(l_quantity - med), 0.5)").as("mad_qty"))
        .orderBy("l_returnflag")
    },
    Some("""WITH med AS (
           |  SELECT l_returnflag, CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE) AS med
           |  FROM lineitem GROUP BY 1)
           |SELECT l_returnflag,
           |  ANY_VALUE(med) AS median_qty,
           |  CAST(quantile_cont(abs(l_quantity - med), 0.5) AS DOUBLE) AS mad_qty
           |FROM lineitem JOIN med USING (l_returnflag)
           |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  // Period-over-period reporting: monthly revenue per order status with
  // the previous month's value and % change (lag window over exact
  // decimal monthly sums; the division is the only float step, 9dp cut).
  private val percentChange = Q(
    "q_percent_change",
    (s, dir) => {
      val monthly = t(s, dir, "orders")
        .groupBy(col("o_orderstatus"),
          date_format(col("o_orderdate"), "yyyy-MM").as("month"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("rev_dec"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_orderstatus").orderBy("month")
      monthly
        .withColumn("prev_dec", lag(col("rev_dec"), 1).over(w))
        .select(col("o_orderstatus"), col("month"),
          col("rev_dec").cast(DoubleType).as("rev"),
          col("prev_dec").cast(DoubleType).as("prev_rev"),
          round((col("rev_dec").cast(DoubleType) - col("prev_dec").cast(DoubleType)) /
            col("prev_dec").cast(DoubleType) * 100, 9).as("pct_change"))
        .orderBy("o_orderstatus", "month")
    },
    Some("""WITH monthly AS (
           |  SELECT o_orderstatus, strftime(o_orderdate, '%Y-%m') AS month,
           |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
           |  FROM orders GROUP BY 1, 2),
           |lagged AS (
           |  SELECT o_orderstatus, month, rev_dec,
           |    lag(rev_dec) OVER (PARTITION BY o_orderstatus ORDER BY month) AS prev_dec
           |  FROM monthly)
           |SELECT o_orderstatus, month,
           |  CAST(rev_dec AS DOUBLE) AS rev,
           |  CAST(prev_dec AS DOUBLE) AS prev_rev,
           |  round((CAST(rev_dec AS DOUBLE) - CAST(prev_dec AS DOUBLE)) /
           |        CAST(prev_dec AS DOUBLE) * 100, 9) AS pct_change
           |FROM lagged ORDER BY o_orderstatus, month""".stripMargin))

  // Rolling z-score: monthly revenue vs its own trailing-6-month window
  // (ROWS -5..0) — the moving-baseline anomaly detector. Window Σ and Σ²
  // stay in exact decimal (order-independent within the frame), so the z
  // formula sees identical IEEE inputs on both engines; 9dp cut.
  private val rollingZscore = Q(
    "q_rolling_zscore",
    (s, dir) => {
      val monthly = t(s, dir, "orders")
        .groupBy(col("o_orderstatus"),
          date_format(col("o_orderdate"), "yyyy-MM").as("month"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("rev_dec"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_orderstatus").orderBy("month").rowsBetween(-5, 0)
      val n = count(lit(1)).over(w).cast(DoubleType)
      val s1 = sum(col("rev_dec")).over(w).cast(DoubleType)
      val s2 = sum((col("rev_dec") * col("rev_dec")).cast(DecimalType(38, 4)))
        .over(w).cast(DoubleType)
      val mean = s1 / n
      val variance = s2 / n - mean * mean
      monthly
        .withColumn("z", when(variance <= 0, lit(0.0))
          .otherwise(round((col("rev_dec").cast(DoubleType) - mean) / sqrt(variance), 9)))
        .select(col("o_orderstatus"), col("month"),
          col("rev_dec").cast(DoubleType).as("rev"), col("z"))
        .orderBy("o_orderstatus", "month")
    },
    Some("""WITH monthly AS (
           |  SELECT o_orderstatus, strftime(o_orderdate, '%Y-%m') AS month,
           |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
           |  FROM orders GROUP BY 1, 2),
           |win AS (
           |  SELECT o_orderstatus, month, rev_dec,
           |    CAST(COUNT(*) OVER w AS DOUBLE) AS n,
           |    CAST(SUM(rev_dec) OVER w AS DOUBLE) AS s1,
           |    CAST(SUM(CAST(rev_dec * rev_dec AS DECIMAL(38,4))) OVER w AS DOUBLE) AS s2
           |  FROM monthly
           |  WINDOW w AS (PARTITION BY o_orderstatus ORDER BY month
           |               ROWS BETWEEN 5 PRECEDING AND CURRENT ROW))
           |SELECT o_orderstatus, month, CAST(rev_dec AS DOUBLE) AS rev,
           |  CASE WHEN s2/n - (s1/n)*(s1/n) <= 0 THEN 0.0
           |       ELSE round((CAST(rev_dec AS DOUBLE) - s1/n) /
           |                  sqrt(s2/n - (s1/n)*(s1/n)), 9) END AS z
           |FROM win ORDER BY o_orderstatus, month""".stripMargin))

  // Interval merge (union of overlapping per-key intervals): supplier
  // "busy windows" from ship date + a data-derived duration. Islands via
  // the running-max-of-ends gap flag; tie order (s, e) is island-invariant
  // (same-start intervals always overlap) so both engines agree.
  private val intervalMerge = Q(
    "q_interval_merge",
    (s, dir) => {
      // DISTINCT is load-bearing, not just a speedup: interval union is
      // duplicate-insensitive, and collapsing twin rows makes (s, e)
      // a strict total order per partition — otherwise an engine may
      // permute identical rows between the gap-flag window and the
      // island cum-sum window, attaching a twin's flag to the wrong
      // position and silently merging neighboring islands.
      val iv = t(s, dir, "lineitem").select(
        col("l_suppkey"), col("l_returnflag"),
        to_date(col("l_shipdate")).as("s"),
        date_add(to_date(col("l_shipdate")),
          (col("l_quantity").cast("int") % 5 + 1)).as("e"))
        .distinct()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("l_suppkey", "l_returnflag").orderBy("s", "e")
      val prevMax = max(col("e")).over(w.rowsBetween(Long.MinValue, -1))
      val island = sum(
        when(prevMax.isNull || col("s") > prevMax, 1).otherwise(0))
        .over(w.rowsBetween(Long.MinValue, 0))
      iv.withColumn("island", island)
        .groupBy("l_suppkey", "l_returnflag", "island")
        .agg(min(col("s")).as("is_"), max(col("e")).as("ie"))
        .groupBy("l_suppkey", "l_returnflag")
        .agg(count(lit(1)).as("n_islands"),
          sum(datediff(col("ie"), col("is_")) + 1).as("covered_days"),
          max(datediff(col("ie"), col("is_")) + 1).cast("long").as("longest_days"))
        .orderBy("l_suppkey", "l_returnflag")
    },
    Some("""WITH iv AS (
           |  SELECT DISTINCT l_suppkey, l_returnflag, CAST(l_shipdate AS DATE) AS s,
           |    CAST(CAST(l_shipdate AS DATE)
           |         + to_days(CAST(l_quantity AS INTEGER) % 5 + 1) AS DATE) AS e
           |  FROM lineitem),
           |g AS (
           |  SELECT l_suppkey, l_returnflag, s, e,
           |    max(e) OVER (PARTITION BY l_suppkey, l_returnflag ORDER BY s, e
           |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
           |  FROM iv),
           |isl AS (
           |  SELECT l_suppkey, l_returnflag, s, e,
           |    SUM(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)
           |      OVER (PARTITION BY l_suppkey, l_returnflag ORDER BY s, e
           |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
           |  FROM g),
           |m AS (
           |  SELECT l_suppkey, l_returnflag, island,
           |         min(s) AS is_, max(e) AS ie
           |  FROM isl GROUP BY 1, 2, 3)
           |SELECT l_suppkey, l_returnflag,
           |  count(*) AS n_islands,
           |  CAST(SUM(date_diff('day', is_, ie) + 1) AS BIGINT) AS covered_days,
           |  CAST(MAX(date_diff('day', is_, ie) + 1) AS BIGINT) AS longest_days
           |FROM m GROUP BY 1, 2 ORDER BY l_suppkey, l_returnflag""".stripMargin))

  // Distribution shape of a categorical column per group: Shannon entropy
  // and Gini impurity. Each p·ln p / p² term is rounded to 9 dp and summed
  // as an exact decimal — the ONLY cross-engine-unsafe step (a double SUM
  // is order-dependent) becomes order-independent, the engine's standard
  // trick for transcendental aggregates.
  private val entropyQ = Q(
    "q_entropy",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("o_orderpriority")
      val cnts = t(s, dir, "orders")
        .groupBy("o_orderpriority", "o_orderstatus").agg(count(lit(1)).as("c"))
        .withColumn("n", sum(col("c")).over(w))
      val p = col("c").cast(DoubleType) / col("n").cast(DoubleType)
      cnts
        .withColumn("ent_term", round(p * log(p), 9).cast(DecimalType(18, 9)))
        .withColumn("gini_term", round(p * p, 9).cast(DecimalType(18, 9)))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_classes"),
          (-sum(col("ent_term"))).cast(DoubleType).as("entropy"),
          (lit(1.0) - sum(col("gini_term")).cast(DoubleType)).as("gini"))
        .orderBy("o_orderpriority")
    },
    Some("""WITH c AS (
           |  SELECT o_orderpriority, o_orderstatus, COUNT(*) AS c
           |  FROM orders GROUP BY 1, 2),
           |t AS (
           |  SELECT o_orderpriority, c,
           |    SUM(c) OVER (PARTITION BY o_orderpriority) AS n
           |  FROM c),
           |terms AS (
           |  SELECT o_orderpriority,
           |    CAST(round((CAST(c AS DOUBLE)/CAST(n AS DOUBLE))
           |         * ln(CAST(c AS DOUBLE)/CAST(n AS DOUBLE)), 9) AS DECIMAL(18,9)) AS ent_term,
           |    CAST(round((CAST(c AS DOUBLE)/CAST(n AS DOUBLE))
           |         * (CAST(c AS DOUBLE)/CAST(n AS DOUBLE)), 9) AS DECIMAL(18,9)) AS gini_term
           |  FROM t)
           |SELECT o_orderpriority,
           |  COUNT(*) AS n_classes,
           |  CAST(-SUM(ent_term) AS DOUBLE) AS entropy,
           |  CAST(1.0 AS DOUBLE) - CAST(SUM(gini_term) AS DOUBLE) AS gini
           |FROM terms GROUP BY 1 ORDER BY o_orderpriority""".stripMargin))

  // Weighted sampling without replacement (Efraimidis–Spirakis, content-
  // hash randomness): 50 orders drawn ∝ o_totalprice.
  private val sampleWeighted = Q(
    "q_sample_weighted",
    (s, dir) =>
      Sampling.weightedSample(
        t(s, dir, "orders"), "o_orderkey", "o_totalprice", n = 50)
        .select(col("o_orderkey"), col("o_totalprice"), col("sample_key"))
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey, o_totalprice, sample_key FROM (
           |  SELECT o_orderkey, o_totalprice,
           |    round(ln(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT
           |             / 1152921504606846976.0) / o_totalprice * 1e6, 9) AS sample_key
           |  FROM orders
           |  ORDER BY sample_key DESC, o_orderkey LIMIT 50)
           |ORDER BY o_orderkey""".stripMargin))

  // 2-D Pareto frontier: parts that are undominated in (price↓, size↑).
  // The staircase rewrite (ops/Skyline) replaces the quadratic NOT EXISTS
  // self-join the oracle runs — the hash match proves it equivalent.
  private val skylineQ = Q(
    "q_skyline",
    (s, dir) =>
      Skyline.skyline2d(
        t(s, dir, "part").select("p_partkey", "p_retailprice", "p_size"),
        minCol = "p_retailprice", maxCol = "p_size")
        .orderBy("p_retailprice", "p_partkey"),
    Some("""SELECT p_partkey, p_retailprice, p_size FROM part a
           |WHERE NOT EXISTS (
           |  SELECT 1 FROM part b
           |  WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
           |    AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))
           |ORDER BY p_retailprice, p_partkey""".stripMargin))

  // Single-changepoint detection on the monthly order-VOLUME series:
  // the split k minimizing SSE_left + SSE_right, both derived from
  // prefix sums of cnt and cnt² — exact INTEGERS, and kept under 2^53
  // by construction so the int→double casts are value-preserving on
  // BOTH engines. (The revenue variant is deliberately out: Σr² of a
  // 2-dp money decimal overflows into int128 territory where DuckDB's
  // decimal→double cast is NOT correctly rounded — observed 17-ulp
  // drift at sf0.001 — while counts stay in the exact-double range up
  // to ~10⁶ orders/month.) Every candidate's SSE is then the same
  // pinned IEEE tree. The window is over MONTHS — calendar-bounded
  // (the q_abc_class contract), not data-bounded; the candidate scan
  // is |months| rows and the argmin a deterministic (sse, month) sort.
  // O(1) passes, no per-split rescan: the prefix sums make evaluating
  // all |months| splits one projection.
  private val changepoint = Q(
    "q_changepoint",
    (s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val m = t(s, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
        .agg(count(lit(1)).as("r"))
      val w = W.orderBy("month")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
      val cum = m
        .withColumn("s1", sum(col("r")).over(w))
        .withColumn("s2", sum(col("r") * col("r")).over(w))
        .withColumn("k", row_number().over(W.orderBy("month")).cast("long"))
      val tot = m.agg(count(lit(1)).cast("long").as("n"),
        sum(col("r")).cast("double").as("ts1"),
        sum(col("r") * col("r")).cast("double").as("ts2"))
      cum.crossJoin(broadcast(tot))
        .filter(col("k") < col("n"))
        .select(col("month"), col("k"), col("n"),
          col("s1").cast("double").as("d1"), col("s2").cast("double").as("d2"),
          col("ts1"), col("ts2"))
        .select(col("month"),
          round((col("d2") - (col("d1") * col("d1")) / col("k"))
            + ((col("ts2") - col("d2"))
              - ((col("ts1") - col("d1")) * (col("ts1") - col("d1")))
                / (col("n") - col("k"))), 6).as("sse"),
          round(col("d1") / col("k"), 6).as("mean_left"),
          round((col("ts1") - col("d1")) / (col("n") - col("k")), 6).as("mean_right"))
        .orderBy(col("sse"), col("month"))
        .limit(1)
    },
    Some("""WITH m AS (
           |  SELECT date_trunc('month', o_orderdate)::DATE AS month,
           |    COUNT(*) AS r
           |  FROM orders GROUP BY 1),
           |c AS (
           |  SELECT month, r,
           |    SUM(r) OVER w AS s1,
           |    SUM(r * r) OVER w AS s2,
           |    CAST(row_number() OVER (ORDER BY month) AS BIGINT) AS k
           |  FROM m
           |  WINDOW w AS (ORDER BY month ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
           |tot AS (
           |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(r) AS DOUBLE) AS ts1,
           |    CAST(SUM(r * r) AS DOUBLE) AS ts2
           |  FROM m)
           |SELECT month,
           |  round((d2 - (d1 * d1) / k)
           |    + ((ts2 - d2) - ((ts1 - d1) * (ts1 - d1)) / (n - k)), 6) AS sse,
           |  round(d1 / k, 6) AS mean_left,
           |  round((ts1 - d1) / (n - k), 6) AS mean_right
           |FROM (SELECT month, k, n, CAST(s1 AS DOUBLE) AS d1,
           |        CAST(s2 AS DOUBLE) AS d2, ts1, ts2
           |      FROM c, tot WHERE k < n)
           |ORDER BY sse, month LIMIT 1""".stripMargin))

  // Kaplan-Meier survival of the signup→first-high-value-purchase
  // funnel (value ≥ 150 — the threshold that leaves a real censored
  // population in the fixture: 87/150 users at sf0.01), WITH right
  // censoring at the user's last event — dropping the censored would
  // bias conversion fast. Published as a
  // product estimator; computed here exp-free: each factor's
  // ln(1 − d/n) goes through the repo's 9-dp ln contract and the
  // cumulative product becomes a cumulative EXACT-DECIMAL sum of
  // ln-terms (order-independent where a double product/sum is not), so
  // ln S(t) hash-matches and S is one exp away for the consumer. The
  // at-risk counts are a prefix sum over DISTINCT DURATIONS — a
  // calendar-bounded window (the q_abc_class contract), never a
  // per-user scan. S(t) = 0 (d = n) yields NULL ln_s + a flag.
  private val survivalKm = Q(
    "q_survival_km",
    (s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val ev = events(s, dir)
        .select(col("user_id"), col("event_type"), col("value"),
          expr("ts DIV 86400000000000").as("day"))
      val su = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(col("day")).as("s_day"))
      val pu = ev.filter(col("event_type") === "purchase" && col("value") >= 150.0)
        .join(su, "user_id").filter(col("day") >= col("s_day"))
        .groupBy("user_id").agg(min(col("day")).as("p_day"))
      val last = ev.join(su.select("user_id"), Seq("user_id"))
        .groupBy("user_id").agg(max(col("day")).as("l_day"))
      val durs = su.join(pu, Seq("user_id"), "left").join(last, "user_id")
        .select(col("user_id"),
          when(col("p_day").isNotNull, col("p_day") - col("s_day"))
            .otherwise(col("l_day") - col("s_day")).as("dur"),
          col("p_day").isNotNull.as("died"))
      val byDur = durs.groupBy("dur").agg(
        sum(when(col("died"), 1L).otherwise(0L)).as("d"),
        sum(when(col("died"), 0L).otherwise(1L)).as("c"))
      val wOrd = W.orderBy("dur")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
      val wPrev = W.orderBy("dur")
        .rowsBetween(W.unboundedPreceding, -1)
      val tot = durs.agg(count(lit(1)).as("n_total"))
      byDur.crossJoin(broadcast(tot))
        .withColumn("n_risk",
          col("n_total") - coalesce(sum(col("d") + col("c")).over(wPrev), lit(0L)))
        .withColumn("term",
          when(col("d") > 0 && col("d") < col("n_risk"),
            round(log(lit(1.0) - col("d").cast("double") / col("n_risk")), 9)))
        .withColumn("s_zero",
          max(when(col("d") === col("n_risk"), 1).otherwise(0)).over(wOrd) === 1)
        .withColumn("ln_s",
          when(!col("s_zero"),
            coalesce(sum(col("term").cast(DecimalType(28, 12))).over(wOrd),
              lit(java.math.BigDecimal.ZERO)).cast("double")))
        .select(col("dur"), col("n_risk"), col("d"), col("c"),
          col("s_zero"), col("ln_s"))
        .orderBy("dur")
    },
    Some("""WITH ev AS (
           |  SELECT user_id, event_type, value, epoch_ns(ts) // 86400000000000 AS day
           |  FROM events),
           |su AS (SELECT user_id, MIN(day) AS s_day FROM ev
           |       WHERE event_type = 'signup' GROUP BY 1),
           |pu AS (SELECT e.user_id, MIN(day) AS p_day
           |       FROM ev e JOIN su USING (user_id)
           |       WHERE event_type = 'purchase' AND value >= 150.0 AND day >= s_day
           |       GROUP BY 1),
           |lst AS (SELECT e.user_id, MAX(day) AS l_day
           |        FROM ev e JOIN su USING (user_id) GROUP BY 1),
           |durs AS (
           |  SELECT su.user_id,
           |    CASE WHEN p_day IS NOT NULL THEN p_day - s_day
           |         ELSE l_day - s_day END AS dur,
           |    p_day IS NOT NULL AS died
           |  FROM su LEFT JOIN pu USING (user_id) JOIN lst USING (user_id)),
           |bydur AS (
           |  SELECT dur,
           |    CAST(SUM(CASE WHEN died THEN 1 ELSE 0 END) AS BIGINT) AS d,
           |    CAST(SUM(CASE WHEN died THEN 0 ELSE 1 END) AS BIGINT) AS c
           |  FROM durs GROUP BY 1),
           |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM durs),
           |risk AS (
           |  SELECT dur, d, c,
           |    n_total - COALESCE(CAST(SUM(d + c) OVER
           |      (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
           |      AS n_risk
           |  FROM bydur, tot),
           |terms AS (
           |  SELECT dur, n_risk, d, c,
           |    CASE WHEN d > 0 AND d < n_risk
           |      THEN round(ln(1.0::DOUBLE - CAST(d AS DOUBLE) / n_risk), 9) END AS term,
           |    MAX(CASE WHEN d = n_risk THEN 1 ELSE 0 END) OVER
           |      (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
           |      AS s_zero
           |  FROM risk)
           |SELECT dur, n_risk, d, c, s_zero,
           |  CASE WHEN NOT s_zero THEN
           |    CAST(COALESCE(SUM(CAST(term AS DECIMAL(28,12))) OVER
           |      (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           |      0) AS DOUBLE) END AS ln_s
           |FROM terms ORDER BY dur""".stripMargin))

  // Two-sample Kolmogorov-Smirnov drift statistic (1996 vs 1997 ship
  // years): D = max_v |F1(v) − F2(v)|, the standard
  // distribution-drift monitor. Scale + determinism design: the
  // cumulative counts come from the DISTRIBUTED two-pass prefix sum
  // (ops/PrefixSum — a naive Window.orderBy(v) would single-thread
  // |distinct prices| ≈ |rows| through one task), and the max is over
  // the INTEGER cross-product |c1·n2 − c2·n1| — the CDF comparison in
  // exact arithmetic, one division at the very end. Top-1 via
  // TakeOrdered (k rows cross the wire).
  private val ksDrift = Q(
    "q_ks_drift",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_extendedprice").cast(DecimalType(18, 2)).as("v"),
          year(col("l_shipdate")).as("yr"))
        .filter(col("yr").isin(1996, 1997))
      val counts = graft.ops.BoundedCache.cached(
        li.groupBy("v").agg(
          sum(when(col("yr") === 1996, 1L).otherwise(0L)).as("c1"),
          sum(when(col("yr") === 1997, 1L).otherwise(0L)).as("c2")))
      val cum = graft.ops.PrefixSum.runningSums(counts, "v",
        Seq("c1", "c2"), Seq("f1", "f2"))
      val tot = counts.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
      cum.crossJoin(broadcast(tot))
        .withColumn("dscaled", abs(col("f1") * col("n2") - col("f2") * col("n1")))
        .orderBy(col("dscaled").desc, col("v"))
        .limit(1)
        .select(col("n1"), col("n2"), col("dscaled"),
          round(col("dscaled").cast("double") / (col("n1") * col("n2")), 9).as("d"),
          col("v").cast("double").as("at_v"))
    },
    Some("""WITH li AS (
           |  SELECT CAST(l_extendedprice AS DECIMAL(18,2)) AS v,
           |    year(l_shipdate) AS yr
           |  FROM lineitem WHERE year(l_shipdate) IN (1996, 1997)),
           |counts AS (
           |  SELECT v,
           |    CAST(SUM(CASE WHEN yr = 1996 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
           |    CAST(SUM(CASE WHEN yr = 1997 THEN 1 ELSE 0 END) AS BIGINT) AS c2
           |  FROM li GROUP BY 1),
           |cum AS (
           |  SELECT v,
           |    SUM(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f1,
           |    SUM(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f2
           |  FROM counts),
           |tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
           |        FROM counts)
           |SELECT n1, n2, CAST(abs(f1 * n2 - f2 * n1) AS BIGINT) AS dscaled,
           |  round(CAST(abs(f1 * n2 - f2 * n1) AS DOUBLE) / (n1 * n2), 9) AS d,
           |  CAST(v AS DOUBLE) AS at_v
           |FROM cum, tot
           |ORDER BY abs(f1 * n2 - f2 * n1) DESC, v LIMIT 1""".stripMargin))

  // Population stability index between the same two cohorts over 10
  // fixed-width price bins — the deployed-model drift gate (PSI > 0.2 ⇒
  // investigate). Shares are exact rationals; each nonlinear term
  // (p1−p2)·ln(p1/p2) is 9-dp-rounded then EXACT-DECIMAL summed (the
  // q_chi2 contract: a 10-term double sum is association-order-
  // dependent). One aggregate over 10 bins.
  private val psiDrift = Q(
    "q_psi_drift",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(floor(col("l_extendedprice") / 10000).cast("int").as("bin"),
          year(col("l_shipdate")).as("yr"))
        .filter(col("yr").isin(1996, 1997))
      val bins = li.groupBy(least(col("bin"), lit(9)).as("bin")).agg(
        sum(when(col("yr") === 1996, 1L).otherwise(0L)).as("c1"),
        sum(when(col("yr") === 1997, 1L).otherwise(0L)).as("c2"))
      val tot = bins.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
      val p1 = col("c1").cast("double") / col("n1")
      val p2 = col("c2").cast("double") / col("n2")
      bins.crossJoin(broadcast(tot))
        .filter(col("c1") > 0 && col("c2") > 0)
        .withColumn("term", round((p1 - p2) * log(p1 / p2), 9))
        .agg(count(lit(1)).as("n_bins"),
          sum(col("term").cast(DecimalType(28, 12))).cast("double").as("psi"))
    },
    Some("""WITH li AS (
           |  SELECT LEAST(CAST(floor(l_extendedprice / 10000) AS INTEGER), 9) AS bin,
           |    year(l_shipdate) AS yr
           |  FROM lineitem WHERE year(l_shipdate) IN (1996, 1997)),
           |bins AS (
           |  SELECT bin,
           |    CAST(SUM(CASE WHEN yr = 1996 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
           |    CAST(SUM(CASE WHEN yr = 1997 THEN 1 ELSE 0 END) AS BIGINT) AS c2
           |  FROM li GROUP BY 1),
           |tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
           |        FROM bins),
           |terms AS (
           |  SELECT round((CAST(c1 AS DOUBLE) / n1 - CAST(c2 AS DOUBLE) / n2)
           |      * ln((CAST(c1 AS DOUBLE) / n1) / (CAST(c2 AS DOUBLE) / n2)), 9) AS term
           |  FROM bins, tot WHERE c1 > 0 AND c2 > 0)
           |SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
           |  CAST(SUM(CAST(term AS DECIMAL(28,12))) AS DOUBLE) AS psi
           |FROM terms""".stripMargin))

  // Gini concentration of per-customer ORDER COUNTS (how concentrated
  // is activity across the customer base). Integer outcomes keep every
  // sufficient statistic an exact integer under 2^53 (the q_changepoint
  // cast contract — a revenue Gini's Σrank·cents overflows into the
  // non-portable int128→double cast zone). Ranks are UNIQUE by the
  // (count, custkey) tiebreak: rank = #smaller-count customers (prefix
  // sum over distinct counts — bounded) + within-tie row_number
  // (window bounded by the tie group). G = 2Σr·y/(nΣy) − (n+1)/n as a
  // pinned IEEE tree.
  private val giniOrders = Q(
    "q_gini_orders",
    (s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val y = t(s, dir, "orders")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("y"))
      val byY = y.groupBy("y").agg(count(lit(1)).as("cy"))
      val below = graft.ops.PrefixSum.runningSum(byY, "y", "cy", "upto")
        .withColumn("below", col("upto") - col("cy"))
        .select(col("y").as("__y"), col("below"))
      val ranked = y.join(below, col("y") === col("__y"))
        .withColumn("r", col("below") +
          row_number().over(W.partitionBy("y").orderBy("o_custkey")))
      ranked.agg(
          count(lit(1)).as("n"),
          sum(col("y")).as("sy"),
          sum(col("r") * col("y")).as("sry"))
        .select(col("n"), col("sy"),
          round(lit(2.0) * col("sry") / (col("n") * col("sy"))
            - (col("n") + lit(1)).cast("double") / col("n"), 9).as("gini"))
    },
    Some("""WITH y AS (
           |  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS y
           |  FROM orders GROUP BY 1),
           |r AS (
           |  SELECT o_custkey, y,
           |    CAST(row_number() OVER (ORDER BY y, o_custkey) AS BIGINT) AS r
           |  FROM y)
           |SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS sy,
           |  round(2.0::DOUBLE * SUM(r * y) / (COUNT(*) * SUM(y))
           |    - CAST(COUNT(*) + 1 AS DOUBLE) / COUNT(*), 9) AS gini
           |FROM r""".stripMargin))

  // Autocorrelation function of the daily order volume at lags 1..7 —
  // the "is there weekly structure / how fast does memory decay"
  // diagnostic feeding the seasonality and forecast gates. Exactness
  // trick: multiply the centered series through by T so every centered
  // value T·y_t − S is an exact INTEGER; numerators and denominator are
  // then exact integer sums (< 2^53 at any plausible daily scale) and
  // each r_k is ONE IEEE division. Lag pairing is a self-join on
  // day − k (calendar-aware: a gap day pairs with nothing), fan-out ≤ 7
  // rows per day, daily table bounded by the calendar.
  private val acf = Q(
    "q_acf",
    (s, dir) => {
      val daily = graft.ops.BoundedCache.cached(
        t(s, dir, "orders")
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(count(lit(1)).as("y")))
      val tot = daily.agg(count(lit(1)).as("tt"), sum(col("y")).as("ss"),
        sum(col("y") * col("y")).as("syy"))
      val a = daily.select(col("day"), col("y").as("ya"),
        explode(sequence(lit(1), lit(7))).as("lagk"))
      val b = daily.select(col("day").as("__bd"), col("y").as("yb"))
      a.join(b, expr("date_sub(day, lagk)") === col("__bd"))
        .crossJoin(broadcast(tot))
        .groupBy("lagk")
        .agg(count(lit(1)).as("n_pairs"),
          sum((col("tt") * col("ya") - col("ss"))
            * (col("tt") * col("yb") - col("ss"))).as("num"))
        .crossJoin(broadcast(tot))
        .select(col("lagk"), col("n_pairs"),
          round(col("num").cast("double")
            / (col("tt") * (col("tt") * col("syy") - col("ss") * col("ss")))
              .cast("double"), 9).as("r"))
        .orderBy("lagk")
    },
    Some("""WITH daily AS (
           |  SELECT CAST(o_orderdate AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
           |  FROM orders GROUP BY 1),
           |tot AS (
           |  SELECT CAST(COUNT(*) AS BIGINT) AS tt, CAST(SUM(y) AS BIGINT) AS ss,
           |    CAST(SUM(y * y) AS BIGINT) AS syy
           |  FROM daily),
           |pairs AS (
           |  SELECT k.lagk, a.y AS ya, b.y AS yb
           |  FROM daily a
           |  CROSS JOIN (SELECT unnest(range(1, 8)) AS lagk) k
           |  JOIN daily b ON b.day = a.day - CAST(lagk AS INTEGER))
           |SELECT CAST(lagk AS INTEGER) AS lagk, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           |  round(CAST(SUM((tt * ya - ss) * (tt * yb - ss)) AS DOUBLE)
           |    / CAST(tt * (tt * syy - ss * ss) AS DOUBLE), 9) AS r
           |FROM pairs, tot
           |GROUP BY lagk, tt, syy, ss ORDER BY lagk""".stripMargin))

  // Robust trend: Mann-Kendall S/tau + the Theil-Sen slope over the
  // monthly volume series. All pairwise — but over MONTHS, so the pair
  // space is calendar²-bounded (3k pairs for 80 months), never data².
  // S and tau are exact integers / one division; the Sen slope is the
  // nearest-rank median of pairwise Δy/Δx slopes, selected by a
  // deterministic (slope, m1, m2) order — Δy, Δx exact integers, each
  // slope ONE IEEE division, so the median element is the same row on
  // both engines.
  private val trendRobust = Q(
    "q_trend_robust",
    (s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val m = graft.ops.BoundedCache.cached(
        t(s, dir, "orders")
          .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
          .agg(count(lit(1)).as("y"))
          .withColumn("mi", (year(col("month")) * 12 + month(col("month"))).cast("long")))
      val pairs = m.as("a").join(m.as("b"), col("a.mi") < col("b.mi"))
        .select((col("b.y") - col("a.y")).as("dy"), (col("b.mi") - col("a.mi")).as("dx"),
          col("a.mi").as("m1"), col("b.mi").as("m2"))
      val mk = pairs.agg(
        count(lit(1)).as("n_pairs"),
        sum(signum(col("dy")).cast("long")).as("s_mk"))
      val ranked = pairs
        .withColumn("slope", round(col("dy").cast("double") / col("dx"), 9))
        .withColumn("rn", row_number().over(W.orderBy(col("slope"), col("m1"), col("m2"))))
      val med = ranked.crossJoin(broadcast(mk))
        .filter(col("rn") === expr("(n_pairs + 1) DIV 2"))
        .select(col("n_pairs").as("__np"), col("slope").as("sen_slope"))
      mk.crossJoin(broadcast(med))
        .select(col("n_pairs"), col("s_mk"),
          round(col("s_mk").cast("double") / col("n_pairs"), 9).as("tau"),
          col("sen_slope"))
    },
    Some("""WITH m0 AS (
           |  SELECT date_trunc('month', o_orderdate)::DATE AS month,
           |    CAST(COUNT(*) AS BIGINT) AS y
           |  FROM orders GROUP BY 1),
           |m AS (
           |  SELECT month, y,
           |    CAST(year(month) * 12 + month(month) AS BIGINT) AS mi
           |  FROM m0),
           |pairs AS (
           |  SELECT b.y - a.y AS dy, b.mi - a.mi AS dx, a.mi AS m1, b.mi AS m2
           |  FROM m a JOIN m b ON a.mi < b.mi),
           |mk AS (
           |  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           |    CAST(SUM(sign(dy)) AS BIGINT) AS s_mk
           |  FROM pairs),
           |ranked AS (
           |  SELECT round(CAST(dy AS DOUBLE) / dx, 9) AS slope,
           |    row_number() OVER (ORDER BY round(CAST(dy AS DOUBLE) / dx, 9), m1, m2) AS rn
           |  FROM pairs),
           |med AS (
           |  SELECT slope AS sen_slope FROM ranked, mk WHERE rn = (n_pairs + 1) // 2)
           |SELECT n_pairs, s_mk,
           |  round(CAST(s_mk AS DOUBLE) / n_pairs, 9) AS tau,
           |  sen_slope
           |FROM mk, med""".stripMargin))

  // Lorenz curve at deciles — the curve behind q_gini_orders: cumulative
  // share of order volume held by the bottom d/10 of customers (ranked
  // by activity, ties broken by custkey exactly as the Gini ranks).
  // Decile cutoffs are exact integer ranks ⌊n·d/10⌋; the cumulative
  // volumes come from one broadcast non-equi join of the ranked frame
  // against 10 cutoff rows (never a second sort), and every share is
  // one IEEE division of exact integers.
  private val lorenz = Q(
    "q_lorenz",
    (s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val y = t(s, dir, "orders")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("y"))
      val byY = y.groupBy("y").agg(count(lit(1)).as("cy"))
      val below = graft.ops.PrefixSum.runningSum(byY, "y", "cy", "upto")
        .withColumn("below", col("upto") - col("cy"))
        .select(col("y").as("__y"), col("below"))
      val ranked = graft.ops.BoundedCache.cached(
        y.join(below, col("y") === col("__y"))
          .withColumn("r", col("below") +
            row_number().over(W.partitionBy("y").orderBy("o_custkey")))
          .select("y", "r"))
      val tot = ranked.agg(count(lit(1)).as("n"), sum(col("y")).as("sy"))
      val deciles = s.range(1, 11).toDF("d").crossJoin(broadcast(tot))
        .withColumn("cutoff", expr("n * d DIV 10"))
      // INNER join with the 10-row decile frame as the broadcast side: a
      // LEFT join from deciles would force BroadcastNestedLoopJoin to
      // build the full |customers| ranked frame (left-outer cannot build
      // left). Every customer matches at least decile 10 (cutoff = n), so
      // inner loses only deciles whose cutoff undercuts every rank — the
      // tiny left-join below restores those with cum_y = 0.
      val cum = ranked.join(broadcast(deciles), col("r") <= col("cutoff"))
        .groupBy("d").agg(sum(col("y")).as("cum_y"))
        .withColumnRenamed("d", "__d")
      deciles.join(broadcast(cum), col("d") === col("__d"), "left")
        .select(col("d").cast("int").as("decile"),
          col("cutoff").as("n_customers"),
          round(coalesce(col("cum_y"), lit(0L)).cast("double") / col("sy"), 9)
            .as("volume_share"))
        .orderBy("decile")
    },
    Some("""WITH y AS (
           |  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS y
           |  FROM orders GROUP BY 1),
           |ranked AS (
           |  SELECT y, CAST(row_number() OVER (ORDER BY y, o_custkey) AS BIGINT) AS r
           |  FROM y),
           |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS sy
           |        FROM ranked),
           |deciles AS (
           |  SELECT CAST(d AS INTEGER) AS decile, n * d // 10 AS cutoff, sy
           |  FROM (SELECT unnest(range(1, 11)) AS d) CROSS JOIN tot)
           |SELECT decile, cutoff AS n_customers,
           |  round(CAST(COALESCE(SUM(y), 0) AS DOUBLE) / sy, 9) AS volume_share
           |FROM deciles LEFT JOIN ranked ON r <= cutoff
           |GROUP BY decile, cutoff, sy
           |ORDER BY decile""".stripMargin))

  // CUSUM control chart over the monthly volume series — the sequential
  // drift detector. The textbook recursion S_t = max(0, S_{t−1} + x_t − k)
  // looks inherently serial, but max-plus is associative: S_t =
  // P_t − min_{j≤t} P_j with P the plain prefix sum of (x_t − k) — so
  // the chart falls out of TWO parallel prefix scans (sum, then running
  // min), no sequential pass anywhere. Reference k = the series' own
  // integer mean floor(Σx/n) keeps every value an exact integer: P_t is
  // Σx_{1..t} − t·k, exactly. Alarm = S_t > 5·⌈√(Σ(x−x̄)²/n)⌉ (an
  // integer threshold derived once). Windows are over months —
  // calendar-bounded (the q_abc_class contract).
  private val cusum = Q(
    "q_cusum",
    (s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val m = t(s, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
        .agg(count(lit(1)).as("x"))
      val tot = m.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
      val w = W.orderBy("month")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
      m.crossJoin(broadcast(tot))
        .withColumn("k", expr("sx DIV n"))
        .withColumn("p", sum(col("x")).over(w) - col("k")
          * row_number().over(W.orderBy("month")))
        .withColumn("minp", least(min(col("p")).over(w), lit(0L)))
        .withColumn("cusum", col("p") - col("minp"))
        .withColumn("thr", lit(5L) * ceil(sqrt(
          (col("sxx") - (col("sx") * col("sx")).cast("double") / col("n"))
            / col("n"))).cast("long"))
        .select(col("month"), col("x"), col("cusum"),
          (col("cusum") > col("thr")).as("alarm"))
        .orderBy("month")
    },
    Some("""WITH m AS (
           |  SELECT date_trunc('month', o_orderdate)::DATE AS month,
           |    CAST(COUNT(*) AS BIGINT) AS x
           |  FROM orders GROUP BY 1),
           |tot AS (
           |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
           |    CAST(SUM(x * x) AS BIGINT) AS sxx
           |  FROM m),
           |c AS (
           |  SELECT month, x, sx // n AS k,
           |    CAST(SUM(x) OVER w AS BIGINT) - (sx // n) * CAST(row_number() OVER (ORDER BY month) AS BIGINT) AS p,
           |    n, sx, sxx
           |  FROM m, tot
           |  WINDOW w AS (ORDER BY month ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
           |s AS (
           |  SELECT month, x,
           |    p - LEAST(MIN(p) OVER (ORDER BY month
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS cusum,
           |    5 * CAST(ceil(sqrt((sxx - CAST(sx * sx AS DOUBLE) / n) / n)) AS BIGINT) AS thr
           |  FROM c)
           |SELECT month, x, cusum, cusum > thr AS alarm
           |FROM s ORDER BY month""".stripMargin))

  // Difference-in-differences (the 2×2 canonical causal design):
  // ATT = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre), treatment =
  // BUILDING-segment customers, policy date pinned at 1998-07-01.
  // Four exact-decimal sums + four counts are the ENTIRE sufficient
  // state (one combiner-friendly aggregate row per cell at any scale);
  // the estimate is a pinned IEEE tree over their ratios. The dim join
  // broadcasts; the fact table never shuffles twice.
  private val diffInDiff = Q(
    "q_diff_in_diff",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val seg = t(s, dir, "customer")
        .select(col("c_custkey").as("o_custkey"),
          (col("c_mktsegment") === "BUILDING").as("treated"))
      val cells = o.join(broadcast(seg), "o_custkey")
        .withColumn("post", col("o_orderdate") >= lit("1998-07-01").cast("date"))
        .groupBy("treated", "post")
        .agg(dsum(col("o_totalprice")).as("s"), count(lit(1)).cast("long").as("n"))
        .withColumn("mean", col("s") / col("n"))
      val m = cells.groupBy()
        .pivot(concat(when(col("treated"), lit("t")).otherwise(lit("c")),
          when(col("post"), lit("1")).otherwise(lit("0"))),
          Seq("t0", "t1", "c0", "c1"))
        .agg(first(col("mean")))
      m.select(
          round(col("t0"), 6).as("mean_t_pre"), round(col("t1"), 6).as("mean_t_post"),
          round(col("c0"), 6).as("mean_c_pre"), round(col("c1"), 6).as("mean_c_post"),
          round((col("t1") - col("t0")) - (col("c1") - col("c0")), 6).as("att"))
    },
    Some(s"""WITH cells AS (
            |  SELECT c_mktsegment = 'BUILDING' AS treated,
            |    o_orderdate >= DATE '1998-07-01' AS post,
            |    ${oSum("o_totalprice")} AS s, CAST(COUNT(*) AS BIGINT) AS n
            |  FROM orders JOIN customer ON o_custkey = c_custkey
            |  GROUP BY 1, 2),
            |m AS (
            |  SELECT
            |    MAX(CASE WHEN treated AND NOT post THEN s / n END) AS t0,
            |    MAX(CASE WHEN treated AND post THEN s / n END) AS t1,
            |    MAX(CASE WHEN NOT treated AND NOT post THEN s / n END) AS c0,
            |    MAX(CASE WHEN NOT treated AND post THEN s / n END) AS c1
            |  FROM cells)
            |SELECT round(t0, 6) AS mean_t_pre, round(t1, 6) AS mean_t_post,
            |  round(c0, 6) AS mean_c_pre, round(c1, 6) AS mean_c_post,
            |  round((t1 - t0) - (c1 - c0), 6) AS att
            |FROM m""".stripMargin))

  // Seasonal-naive forecast evaluation (MASE, Hyndman & Koehler 2006):
  // the last 6 months are the holdout; forecast_snaive(m) = volume(m−12),
  // forecast_naive(m) = volume(m−1). Every error is an exact integer
  // |Δcount|, the two MAEs exact-integer sums over the holdout, and the
  // MASE one IEEE division — the "is a model better than carrying last
  // year forward" gate a forecasting pipeline runs before deploying.
  // Windows are over MONTHS (calendar-bounded, the q_abc_class contract).
  private val forecastMase = Q(
    "q_forecast_mase",
    (s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val m = t(s, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
        .agg(count(lit(1)).as("cnt"))
      val w = W.orderBy("month")
      m.withColumn("snaive", lag(col("cnt"), 12).over(w))
        .withColumn("naive", lag(col("cnt"), 1).over(w))
        .withColumn("rn_desc",
          row_number().over(W.orderBy(col("month").desc)))
        .filter(col("rn_desc") <= 6)
        .agg(count(lit(1)).as("n_holdout"),
          (sum(abs(col("cnt") - col("snaive"))).cast("double")
            / count(lit(1))).as("mae_snaive"),
          (sum(abs(col("cnt") - col("naive"))).cast("double")
            / count(lit(1))).as("mae_naive"))
        .select(col("n_holdout"),
          round(col("mae_snaive"), 6).as("mae_snaive"),
          round(col("mae_naive"), 6).as("mae_naive"),
          round(col("mae_snaive") / col("mae_naive"), 9).as("mase"))
    },
    Some("""WITH m AS (
           |  SELECT date_trunc('month', o_orderdate)::DATE AS month, COUNT(*) AS cnt
           |  FROM orders GROUP BY 1),
           |f AS (
           |  SELECT month, cnt,
           |    lag(cnt, 12) OVER (ORDER BY month) AS snaive,
           |    lag(cnt, 1) OVER (ORDER BY month) AS naive,
           |    row_number() OVER (ORDER BY month DESC) AS rn_desc
           |  FROM m),
           |h AS (SELECT * FROM f WHERE rn_desc <= 6),
           |agg AS (
           |  SELECT CAST(COUNT(*) AS BIGINT) AS n_holdout,
           |    CAST(SUM(abs(cnt - snaive)) AS DOUBLE) / COUNT(*) AS mae_snaive,
           |    CAST(SUM(abs(cnt - naive)) AS DOUBLE) / COUNT(*) AS mae_naive
           |  FROM h)
           |SELECT n_holdout, round(mae_snaive, 6) AS mae_snaive,
           |  round(mae_naive, 6) AS mae_naive,
           |  round(mae_snaive / mae_naive, 9) AS mase
           |FROM agg""".stripMargin))

  // Smoothed target encoding (the Micci-Barreca empirical-Bayes feature):
  // enc(c) = (Σy_c + m·μ)/(n_c + m) — the category mean shrunk toward the
  // global mean by pseudo-count m, the leakage-safe way to turn a
  // high-cardinality category into one numeric feature. Sums are exact
  // decimals; μ and every encode are single pinned IEEE divisions, so the
  // doubles hash across engines. One map-side-combined aggregate per
  // category + a broadcast scalar — flat in corpus size.
  private val targetEncode = Q(
    "q_target_encode",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val g = o.agg(dsum(col("o_totalprice")).as("gsum"),
        count(lit(1)).cast("long").as("gn"))
      val m = 50.0
      o.groupBy("o_orderpriority")
        .agg(count(lit(1)).cast("long").as("n"),
          dsum(col("o_totalprice")).as("csum"))
        .crossJoin(broadcast(g))
        .select(col("o_orderpriority"), col("n"),
          round(col("csum") / col("n"), 6).as("raw_mean"),
          round((col("csum") + lit(m) * (col("gsum") / col("gn")))
            / (col("n").cast("double") + lit(m)), 6).as("encoded"))
        .orderBy("o_orderpriority")
    },
    Some(s"""WITH g AS (SELECT ${oSum("o_totalprice")} AS gsum,
            |  CAST(COUNT(*) AS BIGINT) AS gn FROM orders),
            |c AS (SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
            |  ${oSum("o_totalprice")} AS csum FROM orders GROUP BY 1)
            |SELECT o_orderpriority, n,
            |  round(csum / n, 6) AS raw_mean,
            |  round((csum + 50.0::DOUBLE * (gsum / gn))
            |    / (CAST(n AS DOUBLE) + 50.0::DOUBLE), 6) AS encoded
            |FROM c, g ORDER BY o_orderpriority""".stripMargin))

  // Weekly-seasonality strength of the daily order volume: R² of the
  // day-of-week model = 1 − SSE_within/SSE_total, every sufficient
  // statistic an exact integer (counts and count², < 2^53 — the
  // q_changepoint cast contract). One row out; the answer to "does this
  // metric need deseasonalizing before anomaly detection".
  private val seasonality = Q(
    "q_seasonality",
    (s, dir) => {
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("dow", (weekday(col("day")) + 1).cast("int"))
      val byDow = daily.groupBy("dow")
        .agg(count(lit(1)).as("nd"), sum("cnt").as("s1"),
          sum(col("cnt") * col("cnt")).as("s2"))
        .select(
          sum(col("nd")).as("n_days"),
          sum(col("s1")).cast("double").as("t1"),
          sum(col("s2")).cast("double").as("t2"),
          // per-dow terms are nonlinear (s1²/nd) → 6-dp round then exact
          // decimal sum (the q_chi2 contract), or the 7-term double sum
          // would be association-order-dependent across engines
          sum(round(col("s2").cast("double")
              - (col("s1") * col("s1")).cast("double") / col("nd"), 6)
            .cast(DecimalType(28, 6))).cast("double").as("ssw"))
      byDow.select(col("n_days"),
        round(col("t2") - col("t1") * col("t1") / col("n_days"), 6).as("sst"),
        round(col("ssw"), 6).as("ssw"),
        round(lit(1.0) - col("ssw")
          / (col("t2") - col("t1") * col("t1") / col("n_days")), 9).as("r2_dow"))
    },
    Some("""WITH daily AS (
           |  SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS cnt
           |  FROM orders GROUP BY 1),
           |d AS (SELECT isodow(day) AS dow, cnt FROM daily),
           |bydow AS (
           |  SELECT dow, CAST(COUNT(*) AS BIGINT) AS nd,
           |    CAST(SUM(cnt) AS BIGINT) AS s1, CAST(SUM(cnt * cnt) AS BIGINT) AS s2
           |  FROM d GROUP BY 1),
           |agg AS (
           |  SELECT CAST(SUM(nd) AS BIGINT) AS n_days,
           |    CAST(SUM(s1) AS DOUBLE) AS t1, CAST(SUM(s2) AS DOUBLE) AS t2,
           |    CAST(SUM(CAST(round(CAST(s2 AS DOUBLE) - CAST(s1 * s1 AS DOUBLE) / nd, 6)
           |      AS DECIMAL(28,6))) AS DOUBLE) AS ssw
           |  FROM bydow)
           |SELECT n_days,
           |  round(t2 - t1 * t1 / n_days, 6) AS sst,
           |  round(ssw, 6) AS ssw,
           |  round(1.0::DOUBLE - ssw / (t2 - t1 * t1 / n_days), 9) AS r2_dow
           |FROM agg""".stripMargin))

  val all: Seq[Q] = Seq(pivotQ, statsExact, sampleMod, sampleStratified, saltedJoin, histogram, skylineQ, changepoint, targetEncode, seasonality, survivalKm, diffInDiff, forecastMase, ksDrift, psiDrift, giniOrders, lorenz, acf, trendRobust, rfm, cusum,
    rangeJoinBinned, intervalJoin, rollingMedian, histogramEqd, skewProfile,
    featureBucketize, modeQ,
    topkHeap, cohortRetention, attribution, shareOfTotal,
    eventTransitions, abcClass, gapsIslands, madQ, percentChange,
    rollingZscore, intervalMerge, entropyQ, sampleWeighted)
}
