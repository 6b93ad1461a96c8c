package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import QueryUtil._

/**
 * Graph-shaped analytics: the full TPC-H-style star-schema join chain and
 * an iterative fixed-point computation (weighted PageRank) over the graph
 * that chain induces — the "domain authority" scoring shape a web-corpus
 * pipeline uses to weight documents by source quality.
 */
object Graph {

  /**
   * TPC-H Q5 shape: revenue per supplier nation for one region and year,
   * through the 6-table chain lineitem⋈orders⋈customer⋈supplier⋈nation⋈
   * region with the local-supplier constraint (customer and supplier in
   * the same nation). Scale shape: region/nation broadcast (no fact
   * shuffle for dims), customer and supplier hash-join the facts, the
   * date filter pushes into the orders scan so the join sees one year,
   * and revenue is the exact-decimal sum.
   */
  private val joinFive = Q(
    "q_join_five",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val c = t(s, dir, "customer")
      val su = t(s, dir, "supplier")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(su, li("l_suppkey") === su("s_suppkey")
          && c("c_nationkey") === su("s_nationkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        // decimal×decimal BEFORE the product: multiplying in double and
        // casting after diverges from DuckDB on half-cent boundaries
        .agg(sum(li("l_extendedprice").cast(DecimalType(18, 2))
            * (lit(1.00).cast(DecimalType(3, 2))
              - li("l_discount").cast(DecimalType(18, 2))))
          .cast(DoubleType).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some(s"""SELECT n_name,
            |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
            |    * (CAST(1.00 AS DECIMAL(3,2))
            |      - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
            |FROM lineitem
            |JOIN orders ON l_orderkey = o_orderkey
            |JOIN customer ON o_custkey = c_custkey
            |JOIN supplier ON l_suppkey = s_suppkey
            |  AND c_nationkey = s_nationkey
            |JOIN nation ON s_nationkey = n_nationkey
            |JOIN region ON n_regionkey = r_regionkey
            |WHERE r_name = 'ASIA'
            |  AND o_orderdate >= TIMESTAMP '1996-01-01'
            |  AND o_orderdate < TIMESTAMP '1997-01-01'
            |GROUP BY n_name
            |ORDER BY revenue DESC, n_name""".stripMargin))

  /**
   * Weighted PageRank (3 fixed iterations, damping 0.85) over the nation
   * trade graph: edge (customer nation → supplier nation) weighted by
   * lineitem count. Determinism: contributions are IEEE doubles from
   * identical inputs, each per-node inflow is an order-independent
   * DECIMAL(28,12) sum, and every iteration's rank is rounded to 9 dp —
   * so three chained iterations stay bit-identical across engines.
   *
   * Scale shape: the data-sized work is the one edge-building join+agg
   * (cached — the iterations reuse it); each iteration then joins
   * |edges| ≤ |nations|² rows against a broadcast rank table, so
   * iteration cost is independent of corpus size. The same loop applied
   * to a web-domain graph (|nodes| ~ 1e8) drops the broadcast for a
   * hash-partitioned rank join — the plan shape per iteration is
   * unchanged: join, project, partial+final aggregate.
   */
  private val pagerank = Q(
    "q_graph_pagerank",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val su = t(s, dir, "supplier")
      val n = t(s, dir, "nation")
      val nc = n.select(col("n_nationkey").as("__ck"), col("n_name").as("src"))
      val ns = n.select(col("n_nationkey").as("__sk"), col("n_name").as("dst"))
      val edges = graft.ops.BoundedCache.cached(
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(su, li("l_suppkey") === su("s_suppkey"))
          .join(broadcast(nc), c("c_nationkey") === col("__ck"))
          .join(broadcast(ns), su("s_nationkey") === col("__sk"))
          .groupBy("src", "dst").agg(count(lit(1)).as("w")))
      val outW = edges.groupBy("src").agg(sum(col("w")).as("tw"))
      val nodes = n.select(col("n_name").as("node"))
      var ranks = nodes.withColumn("pr", lit(1.0))
      for (_ <- 1 to 3) {
        val contrib = edges
          .join(outW, "src")
          .join(broadcast(ranks), col("src") === col("node"))
          .select(col("dst"),
            (col("pr") * col("w") / col("tw")).as("__c"))
          .groupBy("dst")
          .agg(sum(col("__c").cast(DecimalType(28, 12))).cast(DoubleType)
            .as("__in"))
        ranks = nodes.join(contrib, col("node") === col("dst"), "left")
          .select(col("node"),
            round(lit(0.15) + lit(0.85) * coalesce(col("__in"), lit(0.0)), 9)
              .as("pr"))
      }
      ranks.orderBy("node")
    },
    Some("""WITH edges AS (
           |  SELECT nc.n_name AS src, ns.n_name AS dst, COUNT(*) AS w
           |  FROM lineitem
           |  JOIN orders ON l_orderkey = o_orderkey
           |  JOIN customer ON o_custkey = c_custkey
           |  JOIN supplier ON l_suppkey = s_suppkey
           |  JOIN nation nc ON c_nationkey = nc.n_nationkey
           |  JOIN nation ns ON s_nationkey = ns.n_nationkey
           |  GROUP BY 1, 2),
           |ow AS (SELECT src, SUM(w) AS tw FROM edges GROUP BY 1),
           |r0 AS (SELECT n_name AS node, CAST(1.0 AS DOUBLE) AS pr
           |       FROM nation),
           |r1 AS (SELECT n.node,
           |         round(0.15 + 0.85 * COALESCE(s.c, 0), 9) AS pr
           |       FROM r0 n LEFT JOIN (
           |         SELECT e.dst,
           |           CAST(SUM(CAST(r.pr * e.w / o.tw AS DECIMAL(28,12)))
           |             AS DOUBLE) AS c
           |         FROM edges e JOIN ow o ON e.src = o.src
           |         JOIN r0 r ON e.src = r.node GROUP BY 1) s
           |       ON n.node = s.dst),
           |r2 AS (SELECT n.node,
           |         round(0.15 + 0.85 * COALESCE(s.c, 0), 9) AS pr
           |       FROM r0 n LEFT JOIN (
           |         SELECT e.dst,
           |           CAST(SUM(CAST(r.pr * e.w / o.tw AS DECIMAL(28,12)))
           |             AS DOUBLE) AS c
           |         FROM edges e JOIN ow o ON e.src = o.src
           |         JOIN r1 r ON e.src = r.node GROUP BY 1) s
           |       ON n.node = s.dst),
           |r3 AS (SELECT n.node,
           |         round(0.15 + 0.85 * COALESCE(s.c, 0), 9) AS pr
           |       FROM r0 n LEFT JOIN (
           |         SELECT e.dst,
           |           CAST(SUM(CAST(r.pr * e.w / o.tw AS DECIMAL(28,12)))
           |             AS DOUBLE) AS c
           |         FROM edges e JOIN ow o ON e.src = o.src
           |         JOIN r2 r ON e.src = r.node GROUP BY 1) s
           |       ON n.node = s.dst)
           |SELECT node, pr FROM r3 ORDER BY node""".stripMargin))

  /**
   * Triangle counting over the undirected nation trade graph (edges =
   * above-average-weight trade pairs; the adaptive threshold keeps the
   * graph non-degenerate at every scale factor). The a<b<c orientation
   * makes each triangle count once and turns the join into the standard
   * two-hop + closing-edge shape — the plan that scales: |E| shuffles,
   * never |V|³.
   */
  private val triangles = Q(
    "q_graph_triangles",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val su = t(s, dir, "supplier")
      val n = t(s, dir, "nation")
      val nc = n.select(col("n_nationkey").as("__ck"), col("n_name").as("cn"))
      val ns = n.select(col("n_nationkey").as("__sk"), col("n_name").as("sn"))
      // the 6-table join feeds the avg-threshold scalar AND all three
      // triangle roles — bounded-cache it so the fact chain runs once
      val pairs = graft.ops.BoundedCache.cached(
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(su, li("l_suppkey") === su("s_suppkey"))
          .join(broadcast(nc), c("c_nationkey") === col("__ck"))
          .join(broadcast(ns), su("s_nationkey") === col("__sk"))
          .select(least(col("cn"), col("sn")).as("a"),
            greatest(col("cn"), col("sn")).as("b"))
          .filter(col("a") =!= col("b"))
          .groupBy("a", "b").agg(count(lit(1)).as("w")))
      val avgW = pairs.agg((sum(col("w")).cast(DoubleType) / count(lit(1))).as("aw"))
      val edges = pairs.crossJoin(broadcast(avgW))
        .filter(col("w") >= col("aw")).select("a", "b")
      val e1 = edges.select(col("a").as("x"), col("b").as("y"))
      val e2 = edges.select(col("a").as("y"), col("b").as("z"))
      val e3 = edges.select(col("a").as("x"), col("b").as("z"))
      e1.join(e2, "y").join(e3, Seq("x", "z"))
        .select(col("x"), col("y"), col("z"))
        .orderBy("x", "y", "z")
    },
    Some("""WITH pairs AS (
           |  SELECT least(cn, sn) AS a, greatest(cn, sn) AS b, COUNT(*) AS w
           |  FROM lineitem
           |  JOIN orders ON l_orderkey = o_orderkey
           |  JOIN customer ON o_custkey = c_custkey
           |  JOIN supplier ON l_suppkey = s_suppkey
           |  JOIN (SELECT n_nationkey AS ck, n_name AS cn FROM nation) ON c_nationkey = ck
           |  JOIN (SELECT n_nationkey AS sk, n_name AS sn FROM nation) ON s_nationkey = sk
           |  WHERE cn <> sn GROUP BY 1, 2),
           |edges AS (
           |  SELECT a, b FROM pairs
           |  WHERE w >= (SELECT CAST(SUM(w) AS DOUBLE) / COUNT(*) FROM pairs))
           |SELECT e1.a AS x, e1.b AS y, e2.b AS z
           |FROM edges e1
           |JOIN edges e2 ON e2.a = e1.b
           |JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
           |ORDER BY x, y, z""".stripMargin))

  // End-to-end entity resolution (the MDM "match-merge" composite):
  // blocked fuzzy-match candidates (brand+size blocks — candidate work
  // Σ block², never |parts|²) → Jaro-Winkler gate (the same custom
  // codegen expression q_jaro_pairs proves against DuckDB) →
  // large-star/small-star connected components (O(log²) rounds on any
  // topology) → entity id = minimum member + member count, the shape a
  // golden-record/survivorship step consumes directly. At sf0.001 the
  // blocks are too sparse for any ≥0.8 match — empty output on both
  // engines is itself the correct answer there.
  private val entityResolution = Q(
    "q_entity_resolution",
    (s, dir) => {
      graft.functions.StringFunctions.register(s)
      val p = t(s, dir, "part")
      val a = p.select(col("p_partkey").as("k1"), col("p_brand"),
        col("p_size"), col("p_name").as("n1"))
      val b = p.select(col("p_partkey").as("k2"), col("p_brand"),
        col("p_size"), col("p_name").as("n2"))
      // cached: the contraction consumes the edge list over several
      // iterations — without this every round re-runs the jaro join
      val edges = graft.ops.BoundedCache.cached(
        a.join(b, Seq("p_brand", "p_size"))
          .filter(col("k1") < col("k2"))
          .filter(round(expr("jaro_winkler(n1, n2)"), 9) >= 0.8)
          .select(col("k1").as("d1"), col("k2").as("d2")))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("entity_id")
      graft.ops.ConnectedComponents.largeStarSmallStar(edges)
        .select(col("id").as("p_partkey"), col("component").as("entity_id"))
        .withColumn("n_members", count(lit(1)).over(w))
        .orderBy("p_partkey")
    },
    Some("""WITH RECURSIVE pairs AS (
           |  SELECT a.p_partkey AS d1, b.p_partkey AS d2
           |  FROM part a JOIN part b
           |    ON a.p_brand = b.p_brand AND a.p_size = b.p_size
           |   AND a.p_partkey < b.p_partkey
           |  WHERE round(jaro_winkler_similarity(a.p_name, b.p_name), 9) >= 0.8),
           |edges AS (SELECT d1 AS a, d2 AS b FROM pairs
           |          UNION SELECT d2, d1 FROM pairs),
           |reach AS (
           |  SELECT a, b FROM edges
           |  UNION
           |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
           |assign AS (SELECT a AS p_partkey, least(a, min(b)) AS entity_id
           |           FROM reach GROUP BY a)
           |SELECT p_partkey, entity_id,
           |  CAST(COUNT(*) OVER (PARTITION BY entity_id) AS BIGINT) AS n_members
           |FROM assign ORDER BY p_partkey""".stripMargin))

  val all: Seq[Q] = Seq(joinFive, pagerank, triangles, entityResolution)
}
