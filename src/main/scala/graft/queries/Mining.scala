package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ops.Bloom
import QueryUtil._

/**
 * Pattern-mining and sketch-pruning queries (SURVEY.md §2.4): the
 * market-basket / association-rule family every OLAP engine grows, plus
 * the bloom-pruned semi-join (the user-level twin of Spark's runtime
 * bloom-filter injection) and the per-group covariance aggregate that
 * feeds PCA/whitening over the embeddings table.
 */
object Mining {

  private val bloomM = 8192
  private val bloomK = 3

  /** DuckDB replay of [[Bloom.position]] for probe i of SQL expr `key`. */
  private def oPos(key: String, i: Int): String =
    s"(('0x' || substr(md5('$i:' || CAST($key AS VARCHAR)), 1, 15))::BIGINT % $bloomM)"

  // Bloom-pruned semi-join: membership signature of the BUILDING-segment
  // customers (≤ m rows of set bits, independent of member count) is
  // broadcast and probed with k=3 bit-tests — zero shuffle of the orders
  // side — then survivors are EXACTLY verified against the member keys.
  // The output counts bloom passes vs true members per priority class,
  // so the oracle (which rebuilds the identical md5-60bit bit set in
  // SQL) proves the false-positive behavior bit-for-bit, not just the
  // verified final answer. Scale story: when the build side's key set
  // outgrows the broadcast threshold, its m-bit signature does not —
  // scan-side pruning survives where a broadcast semi-join dies.
  private val bloomSemijoin = Q(
    "q_bloom_semijoin",
    (s, dir) => {
      val members = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("key"))
      val bits = Bloom.buildBits(members, "key", bloomM, bloomK)
      val probed = Bloom.probe(t(s, dir, "orders"), "o_custkey", bits, bloomM, bloomK)
      val verified = probed.join(
          broadcast(members.select(col("key").as("__mk")).distinct()),
          col("o_custkey") === col("__mk"), "left")
        .withColumn("is_member", col("__mk").isNotNull)
      verified.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          sum(when(col("bloom_pass"), 1L).otherwise(0L)).as("n_pass"),
          sum(when(col("is_member"), 1L).otherwise(0L)).as("n_member"),
          sum(when(col("bloom_pass") && !col("is_member"), 1L).otherwise(0L)).as("n_fp"))
        .orderBy("o_orderpriority")
    },
    Some(s"""WITH members AS (
            |  SELECT DISTINCT c_custkey AS key FROM customer
            |  WHERE c_mktsegment = 'BUILDING'),
            |bits AS (
            |  SELECT DISTINCT ${oPos("key", 0)} AS pos FROM members
            |  UNION SELECT ${oPos("key", 1)} FROM members
            |  UNION SELECT ${oPos("key", 2)} FROM members),
            |probes AS (
            |  SELECT o_orderpriority,
            |    ${oPos("o_custkey", 0)} IN (SELECT pos FROM bits)
            |      AND ${oPos("o_custkey", 1)} IN (SELECT pos FROM bits)
            |      AND ${oPos("o_custkey", 2)} IN (SELECT pos FROM bits) AS bloom_pass,
            |    o_custkey IN (SELECT key FROM members) AS is_member
            |  FROM orders)
            |SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
            |  CAST(SUM(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
            |  CAST(SUM(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT) AS n_member,
            |  CAST(SUM(CASE WHEN bloom_pass AND NOT is_member THEN 1 ELSE 0 END) AS BIGINT) AS n_fp
            |FROM probes GROUP BY 1 ORDER BY 1""".stripMargin))

  // Market-basket co-occurrence: part pairs ordered together, support
  // ≥ 2 orders. Pair generation is a self-equi-join on the basket key —
  // shuffle ∝ |lineitem| (both sides hash on l_orderkey, exchange
  // reused), pair fan-out bounded by Σ C(basket_i, 2) which real
  // pipelines cap per basket (TPC-H baskets are ≤ 7 lines, so the cap
  // is moot here). Never materializes the |parts|² pair space. The
  // distinct basket frame is bounded-cached: q_basket_rules re-reads it
  // three times (pairs, item supports, total), siblings share one scan.
  private def basketFrame(s: org.apache.spark.sql.SparkSession, dir: String) =
    graft.ops.BoundedCache.cached(
      t(s, dir, "lineitem").select("l_orderkey", "l_partkey").distinct())

  private def pairCounts(li: org.apache.spark.sql.DataFrame) =
    li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("p1"), col("b.l_partkey").as("p2"))
      .groupBy("p1", "p2").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= 2)

  private val basketPairs = Q(
    "q_basket_pairs",
    (s, dir) => {
      pairCounts(basketFrame(s, dir))
        .select(col("p1"), col("p2"), col("n_ab").as("n_orders"))
        .orderBy(desc("n_orders"), col("p1"), col("p2"))
    },
    Some("""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
           |SELECT a.l_partkey AS p1, b.l_partkey AS p2,
           |  CAST(COUNT(*) AS BIGINT) AS n_orders
           |FROM li a JOIN li b
           |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           |GROUP BY 1, 2 HAVING COUNT(*) >= 2
           |ORDER BY n_orders DESC, p1, p2""".stripMargin))

  // Association rules from the co-occurrence pairs: both directions,
  // confidence = supp(a∪b)/supp(a), lift = supp(a∪b)·N/(supp(a)·supp(b)).
  // All ratios are single IEEE divisions of EXACT integer counts, so the
  // doubles are order-independent and hash-match the oracle. The item
  // supports broadcast (≤ |parts| rows); only the pair table shuffles.
  private val basketRules = Q(
    "q_basket_rules",
    (s, dir) => {
      val li = basketFrame(s, dir)
      val pairs = pairCounts(li)
      val dirs = pairs.select(col("p1").as("ante"), col("p2").as("cons"), col("n_ab"))
        .unionAll(pairs.select(col("p2").as("ante"), col("p1").as("cons"), col("n_ab")))
      val ic = li.groupBy(col("l_partkey").as("p")).agg(count(lit(1)).as("n"))
      val tot = li.agg(countDistinct("l_orderkey").as("nn"))
      dirs
        .join(broadcast(ic.select(col("p").as("__pa"), col("n").as("n_ante"))),
          col("ante") === col("__pa"))
        .join(broadcast(ic.select(col("p").as("__pc"), col("n").as("n_cons"))),
          col("cons") === col("__pc"))
        .crossJoin(broadcast(tot))
        .select(col("ante"), col("cons"), col("n_ab"), col("n_ante"), col("n_cons"),
          (col("n_ab").cast("double") / col("n_ante")).as("conf"),
          ((col("n_ab") * col("nn")).cast("double") /
            (col("n_ante") * col("n_cons")).cast("double")).as("lift"))
        .orderBy("ante", "cons")
    },
    Some("""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
           |pairs AS (
           |  SELECT a.l_partkey AS p1, b.l_partkey AS p2,
           |    CAST(COUNT(*) AS BIGINT) AS n_ab
           |  FROM li a JOIN li b
           |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
           |dirs AS (
           |  SELECT p1 AS ante, p2 AS cons, n_ab FROM pairs
           |  UNION ALL SELECT p2, p1, n_ab FROM pairs),
           |ic AS (SELECT l_partkey AS p, CAST(COUNT(*) AS BIGINT) AS n FROM li GROUP BY 1),
           |tot AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS nn FROM li)
           |SELECT ante, cons, n_ab, a.n AS n_ante, b.n AS n_cons,
           |  CAST(n_ab AS DOUBLE) / a.n AS conf,
           |  CAST(n_ab * nn AS DOUBLE) / CAST(a.n * b.n AS DOUBLE) AS lift
           |FROM dirs JOIN ic a ON ante = a.p JOIN ic b ON cons = b.p
           |CROSS JOIN tot
           |ORDER BY ante, cons""".stripMargin))

  // Per-label mean + covariance of the first 4 embedding dims — the
  // sufficient-statistic aggregate that feeds PCA/whitening/Mahalanobis
  // over a vector column. ONE map-side-combined hash aggregate; d +
  // d(d+1)/2 exact-decimal sums per group shuffle (never raw vectors).
  // float×float products are exact in double, so the decimal-cast sums
  // are order-independent and the final IEEE divisions deterministic —
  // the distributed covariance hash-matches a sequential oracle.
  private val embedCovariance = Q(
    "q_embed_covariance",
    (s, dir) => {
      val d = 4
      val e = t(s, dir, "embeddings").select(
        col("label") +:
          (0 until d).map(i =>
            element_at(col("embedding"), i + 1).cast("double").as(s"e$i")): _*)
      val sums = (0 until d).map(i =>
        sum(col(s"e$i").cast(DecimalType(28, 6))).as(s"s$i"))
      val prods = for { i <- 0 until d; j <- i until d } yield
        sum((col(s"e$i") * col(s"e$j")).cast(DecimalType(28, 12))).as(s"p$i$j")
      val aggd = e.groupBy("label")
        .agg(count(lit(1)).as("n"), (sums ++ prods): _*)
      val means = (0 until d).map(i =>
        (col(s"s$i").cast("double") / col("n")).as(s"m$i"))
      val covs = for { i <- 0 until d; j <- i until d } yield
        (col(s"p$i$j").cast("double") / col("n") -
          (col(s"s$i").cast("double") / col("n")) *
          (col(s"s$j").cast("double") / col("n"))).as(s"c$i$j")
      aggd.select(col("label").cast("int").as("label") +: col("n") +: (means ++ covs): _*)
        .orderBy("label")
    },
    Some {
      val d = 4
      def ei(i: Int) = s"CAST(embedding[${i + 1}] AS DOUBLE)"
      val sums = (0 until d).map(i =>
        s"SUM(CAST(${ei(i)} AS DECIMAL(28,6))) AS s$i").mkString(", ")
      val prods = (for { i <- 0 until d; j <- i until d } yield
        s"SUM(CAST(${ei(i)} * ${ei(j)} AS DECIMAL(28,12))) AS p$i$j").mkString(", ")
      val means = (0 until d).map(i =>
        s"CAST(s$i AS DOUBLE) / n AS m$i").mkString(", ")
      val covs = (for { i <- 0 until d; j <- i until d } yield
        s"CAST(p$i$j AS DOUBLE) / n - (CAST(s$i AS DOUBLE) / n) * (CAST(s$j AS DOUBLE) / n) AS c$i$j")
        .mkString(", ")
      s"""WITH a AS (
         |  SELECT CAST(label AS INTEGER) AS label, CAST(COUNT(*) AS BIGINT) AS n,
         |    $sums, $prods
         |  FROM embeddings GROUP BY 1)
         |SELECT label, n, $means, $covs FROM a ORDER BY label""".stripMargin
    })

  // Symmetric int8 quantization of the embedding column (the storage/
  // serving twin of PQ: per-vector absmax scale, q = round(x/scale),
  // |q| ≤ 127 by construction). Pure projection — zero shuffle, 4×
  // smaller vectors downstream. The md5 over the quantized ints proves
  // both engines round every component identically (ties away from
  // zero on both), and max_err certifies |x − q·scale| ≤ scale/2.
  private val embedInt8 = Q(
    "q_embed_int8",
    (s, dir) => {
      t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("scale", {
          val rs = array_max(transform(col("v"), x => abs(x))) / lit(127.0)
          when(rs === 0.0, lit(1.0)).otherwise(rs)
        })
        .withColumn("q", transform(col("v"), x => round(x / col("scale"), 0).cast("int")))
        // NB: max_err must read the RAW scale. Spark 4 lateral column
        // aliases would silently rebind col("scale") to a same-select
        // `round(scale, 9) AS scale` output — so the rounded display
        // column gets its own name only at the end.
        .select(col("vec_id"),
          col("scale"),
          aggregate(col("q"), lit(0L), (acc, x) => acc + x).as("qsum"),
          md5(concat_ws(",", transform(col("q"), _.cast("string")))).as("qfp"),
          round(array_max(transform(col("v"),
            x => abs(x - round(x / col("scale"), 0) * col("scale")))), 9).as("max_err"))
        .withColumn("scale", round(col("scale"), 9))
        .orderBy("vec_id")
    },
    Some("""WITH v AS (
           |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |sc AS (
           |  SELECT vec_id, v,
           |    CASE WHEN s = 0 THEN 1.0::DOUBLE ELSE s END AS scale
           |  FROM (SELECT vec_id, v,
           |          list_max(list_transform(v, x -> abs(x))) / 127.0::DOUBLE AS s
           |        FROM v)),
           |q AS (
           |  SELECT vec_id, v, scale,
           |    list_transform(v, x -> CAST(round(x / scale, 0) AS INTEGER)) AS q
           |  FROM sc)
           |SELECT vec_id, round(scale, 9) AS scale,
           |  CAST(list_sum(q) AS BIGINT) AS qsum,
           |  md5(array_to_string(q, ',')) AS qfp,
           |  round(list_max(list_transform(v,
           |    x -> abs(x - round(x / scale, 0) * scale))), 9) AS max_err
           |FROM q ORDER BY vec_id""".stripMargin))

  // PCA top component by power iteration — the whitening/semdedup
  // precursor built ON the covariance sufficient statistics proven by
  // q_embed_covariance (global this time, not per-label). The iteration
  // itself is THREE UNROLLED steps of v ← C·v / ‖C·v‖ from v₀ = e₀, all
  // on the one aggregated row: a 4×4 matrix-vector product is sixteen
  // scalar multiplies folded LEFT-ASSOCIATIVELY (every + and * is one
  // correctly-rounded IEEE op, sqrt is IEEE-exact too, so both engines
  // produce bit-identical components — no libm, no order-ambiguous SUM).
  // λ is the Rayleigh quotient v₃·(C·v₃). Scale shape: the only
  // data-proportional work is the covariance aggregate (map-side
  // combined, d(d+1)/2 decimal sums — never raw vectors); the iteration
  // is O(d²) on one row regardless of corpus size.
  // ---- shared PCA power-iteration builders (q_embed_pca, q_semdedup_pca)
  private val pcaD = 4
  private def pcaCN(i: Int, j: Int) = s"c${math.min(i, j)}${math.max(i, j)}"
  // left-assoc chain "((t0 + t1) + t2) + t3" — identical shape in both engines
  private def pcaChain(terms: Seq[String]): String =
    terms.reduceLeft((a, b) => s"($a + $b)")

  /** 1-row frame with n, c_ij, and the iterated unit vector v3_0..v3_3. */
  private def pcaV3(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val d = pcaD
    val e = t(s, dir, "embeddings").select(
      (0 until d).map(i =>
        element_at(col("embedding"), i + 1).cast("double").as(s"e$i")): _*)
    val sums = (0 until d).map(i =>
      sum(col(s"e$i").cast(DecimalType(28, 6))).as(s"s$i"))
    val prods = for { i <- 0 until d; j <- i until d } yield
      sum((col(s"e$i") * col(s"e$j")).cast(DecimalType(28, 12))).as(s"p$i$j")
    var f = e.agg(count(lit(1)).as("n"), (sums ++ prods): _*)
    for { i <- 0 until d; j <- i until d }
      f = f.withColumn(s"c$i$j",
        col(s"p$i$j").cast("double") / col("n")
          - (col(s"s$i").cast("double") / col("n"))
          * (col(s"s$j").cast("double") / col("n")))
    // v0 = e0: w1 is just C's first column, then two full mat-vec steps
    var vPrev: Int => String = i => if (i == 0) "1.0D" else "0.0D"
    for (it <- 1 to 3) {
      for (i <- 0 until d)
        f = f.withColumn(s"w${it}_$i",
          expr(pcaChain((0 until d).map(j => s"${pcaCN(i, j)} * ${vPrev(j)}"))))
      f = f.withColumn(s"nrm$it",
        sqrt(expr(pcaChain((0 until d).map(i => s"w${it}_$i * w${it}_$i")))))
      for (i <- 0 until d)
        f = f.withColumn(s"v${it}_$i", col(s"w${it}_$i") / col(s"nrm$it"))
      val itNow = it
      vPrev = i => s"v${itNow}_$i"
    }
    f
  }

  /** DuckDB CTE chain `a, c, w1..i3` — `i3` exposes n, c_ij, v3_i. */
  private def pcaSqlCtes: String = {
    val d = pcaD
    def ei(i: Int) = s"CAST(embedding[${i + 1}] AS DOUBLE)"
    val sums = (0 until d).map(i =>
      s"SUM(CAST(${ei(i)} AS DECIMAL(28,6))) AS s$i").mkString(", ")
    val prods = (for { i <- 0 until d; j <- i until d } yield
      s"SUM(CAST(${ei(i)} * ${ei(j)} AS DECIMAL(28,12))) AS p$i$j").mkString(", ")
    val covs = (for { i <- 0 until d; j <- i until d } yield
      s"CAST(p$i$j AS DOUBLE) / n - (CAST(s$i AS DOUBLE) / n) * (CAST(s$j AS DOUBLE) / n) AS c$i$j")
      .mkString(", ")
    var vPrev: Int => String = i => if (i == 0) "CAST(1.0 AS DOUBLE)" else "CAST(0.0 AS DOUBLE)"
    val its = (1 to 3).map { it =>
      val ws = (0 until d).map(i =>
        s"${pcaChain((0 until d).map(j => s"${pcaCN(i, j)} * ${vPrev(j)}"))} AS w${it}_$i").mkString(", ")
      val wsCte = s"w$it AS (SELECT *, $ws FROM ${if (it == 1) "c" else s"i${it - 1}"})"
      val nrm = s"n$it AS (SELECT *, sqrt(${pcaChain((0 until d).map(i => s"w${it}_$i * w${it}_$i"))}) AS nrm$it FROM w$it)"
      val vs = (0 until d).map(i => s"w${it}_$i / nrm$it AS v${it}_$i").mkString(", ")
      val vCte = s"i$it AS (SELECT *, $vs FROM n$it)"
      vPrev = i => s"v${it}_$i"
      s"$wsCte,\n$nrm,\n$vCte"
    }.mkString(",\n")
    s"""a AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n, $sums, $prods FROM embeddings),
       |c AS (SELECT *, $covs FROM a),
       |$its""".stripMargin
  }

  private val embedPca = {
    val d = pcaD
    Q(
      "q_embed_pca",
      (s, dir) => {
        var f = pcaV3(s, dir)
        for (i <- 0 until d)
          f = f.withColumn(s"w4_$i",
            expr(pcaChain((0 until d).map(j => s"${pcaCN(i, j)} * v3_$j"))))
        f = f.withColumn("lam",
          expr(pcaChain((0 until d).map(i => s"v3_$i * w4_$i"))))
        f.select(
            expr(s"stack($d, ${(0 until d).map(i => s"$i, v3_$i").mkString(", ")}) AS (dim, pc1)"),
            col("lam").as("eigval"))
          .orderBy("dim")
      },
      Some {
        val w4 = (0 until d).map(i =>
          s"${pcaChain((0 until d).map(j => s"${pcaCN(i, j)} * v3_$j"))} AS w4_$i").mkString(", ")
        val lam = pcaChain((0 until d).map(i => s"v3_$i * w4_$i"))
        val pcCase = s"CASE u.dim ${(0 until d).map(i => s"WHEN $i THEN v3_$i").mkString(" ")} END"
        s"""WITH $pcaSqlCtes,
           |f AS (SELECT *, $w4 FROM i3),
           |g AS (SELECT *, $lam AS lam FROM f)
           |SELECT CAST(u.dim AS INTEGER) AS dim, $pcCase AS pc1, lam AS eigval
           |FROM g, (SELECT unnest(range(0, $d)) AS dim) u
           |ORDER BY dim""".stripMargin
      })
  }

  // Semantic dedup in PCA space — the downstream consumer of q_embed_pca:
  // every embedding projects onto the top component (a 4-term left-assoc
  // dot product, bit-identical on both engines because v3 and each
  // multiply/add are), buckets by ⌊proj/0.05⌋, and each bucket keeps one
  // canonical member (min vec_id) — the 1-D, exact-arithmetic form of
  // SemDeDup's cluster-then-prune. Scale shape: covariance agg + broadcast
  // 1-row v3 + stateless projection + ONE groupBy(bucket) — nothing
  // pairwise, shuffle ∝ corpus. floor() is safe here because proj is
  // bit-identical across engines (no independently-recomputed boundary).
  private val semdedupPca = {
    val d = pcaD
    Q(
      "q_semdedup_pca",
      (s, dir) => {
        val v3 = broadcast(pcaV3(s, dir).select((0 until d).map(i => col(s"v3_$i")): _*))
        val e = t(s, dir, "embeddings").select(
          col("vec_id") +: (0 until d).map(i =>
            element_at(col("embedding"), i + 1).cast("double").as(s"e$i")): _*)
        e.crossJoin(v3)
          .withColumn("proj",
            expr(pcaChain((0 until d).map(i => s"e$i * v3_$i"))))
          .withColumn("bucket", floor(col("proj") / lit(0.05)).cast("long"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_members"),
            min("vec_id").as("canonical"),
            (count(lit(1)) - 1).cast("long").as("n_prunable"))
          .orderBy("bucket")
      },
      Some {
        val proj = pcaChain((0 until d).map(i => s"CAST(embedding[${i + 1}] AS DOUBLE) * v3_$i"))
        s"""WITH $pcaSqlCtes,
           |e AS (SELECT vec_id, $proj AS proj FROM embeddings, i3),
           |b AS (SELECT CAST(floor(proj / 0.05) AS BIGINT) AS bucket, vec_id FROM e)
           |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_members,
           |  MIN(vec_id) AS canonical,
           |  CAST(COUNT(*) - 1 AS BIGINT) AS n_prunable
           |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin
      })
  }

  val all: Seq[Q] = Seq(bloomSemijoin, basketPairs, basketRules, embedCovariance,
    embedInt8, embedPca, semdedupPca)
}
