package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic corpus mixing: interleave strata (languages, sources,
 * quality tiers) into one global training order according to integer
 * mixture weights, without engine RNG — the op that turns "60% web,
 * 30% code, 10% books" into an actual row order.
 */
object Mixture {

  /**
   * Stride-scheduling interleave: the r-th document of a stratum with
   * weight w is assigned virtual time (2r−1)·stride / (2w) — the classic
   * deterministic fair scheduler. Sorting by that priority yields an
   * order where every prefix contains each stratum in proportion to its
   * weight (a weight-5 stratum contributes 5 docs for every 1 a weight-1
   * stratum does), with no randomness anywhere: within-stratum order is
   * content-hash (md5) uniform, and the priority is pure integer floor
   * division, portable to any engine.
   *
   * Returns `mix_priority` (the global sort key; ties broken by
   * (mixCol, keyCol) at sort time) and `stratum_rank` (r). Deliberately
   * does NOT materialize a global row number: at scale the total order is
   * a range-partitioned sort by priority — adding row_number over an
   * unpartitioned window would serialize it through one partition. One
   * shuffle (the per-stratum rank window); the priority itself is a
   * projection.
   *
   * `stride` must be large enough that distinct ranks map to distinct
   * priorities for every weight (stride ≥ 2·max weight suffices;
   * 720720 = lcm(1..16)·… keeps division exact for all small weights).
   * Strata absent from `weights` default to weight 1.
   */
  def interleaveByWeight(df: DataFrame, mixCol: String, keyCol: String,
      weights: Map[String, Int], stride: Long = 720720L): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    require(weights.values.forall(_ > 0), "weights must be positive")
    val wcol = weights.tail
      .foldLeft(when(col(mixCol) === weights.head._1, lit(weights.head._2))) {
        case (acc, (k, v)) => acc.when(col(mixCol) === k, lit(v))
      }
      .otherwise(lit(1))
      .cast("long")
    val rw = Window.partitionBy(col(mixCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("stratum_rank", row_number().over(rw).cast("long"))
      .withColumn("__w", wcol)
      .withColumn("mix_priority",
        expr(s"((2 * stratum_rank - 1) * ${stride}L) div (2 * __w)"))
      .drop("__w")
  }

  /**
   * Per-stratum cap in caller-chosen priority order: keep at most `cap`
   * rows of each stratum, preferring rows that sort FIRST on `orderCols`
   * (e.g. quality descending — FineWeb-style per-domain capping, which
   * bounds any one source's share of the corpus while keeping its best
   * documents). Unlike [[graft.ops.Sampling.balancedSample]] (cap = the
   * smallest stratum, order = content-hash uniform), the cap here is a
   * policy constant and the order a meaningful ranking, so the two ops
   * answer different questions: balance vs. bound.
   *
   * One shuffle (the per-stratum rank window); with bounded stratum
   * cardinality the partitions stay executor-sized at corpus scale, and a
   * skewed giant stratum still ranks in O(its size) — no global sort.
   * `orderCols` must totally order rows within a stratum (append a unique
   * id) or the kept set is ambiguous.
   */
  def capPerStratum(df: DataFrame, strataCols: Seq[String],
      orderCols: Seq[org.apache.spark.sql.Column], cap: Int): DataFrame = {
    require(cap > 0, "cap must be positive")
    val w = Window.partitionBy(strataCols.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("stratum_rank", row_number().over(w).cast("long"))
      .filter(col("stratum_rank") <= cap)
  }

  /**
   * Global budget fill: walk rows in the total order given by (unique,
   * numeric, non-null) `orderCol` and keep every row that STARTS before
   * the weight budget is exhausted — "take documents in quality order
   * until the token budget is spent", the greedy corpus-selection rule.
   * The kept set is exactly { row : exclusive-prefix-sum(weight) <
   * budget }, so the last kept row may overshoot — the standard greedy
   * semantics (a budget cut mid-document keeps the document).
   *
   * Distribution is the whole point: a naive cumulative-sum window over
   * ONE global order serializes through a single partition, so this
   * delegates to [[Packing.packGreedyGlobal]]'s two-pass parallel prefix
   * sum (quantile range boundaries → per-range totals → broadcast base
   * offsets + per-range local window) and filters on the derived start
   * offset. Cost: two column-pruned passes + one range-partitioned
   * window; driver state one long per range.
   */
  def selectByBudget(df: DataFrame, orderCol: String, weightCol: String,
      budget: Long, tieCols: Seq[String] = Nil): DataFrame = {
    require(budget > 0, "budget must be positive")
    Packing.packGreedyGlobal(df, orderCol, weightCol, budget, tieCols = tieCols)
      .filter(col("seq_id") === 0L)
      .drop("seq_id", "seq_offset")
  }

  /**
   * Temperature-balanced mixture weights at α = 0.5 — the multilingual
   * training recipe (sample stratum l ∝ count_l^α, α < 1 upweights
   * low-resource strata). α is FIXED at 1/2 because `sqrt` is the one
   * fractional power IEEE 754 requires to be correctly rounded, so the
   * weights are bit-identical on any engine — a general `pow(c, α)`
   * rides each libm's exp/ln and is not portable. Determinism of the
   * shares: `sqrt(c)` exact-rounded per IEEE; the normalizer is an EXACT
   * decimal sum of the (few) per-stratum sqrt values; the share is then
   * ONE double division. `target_docs = floor(share · budget)` — floor,
   * not round, so targets never oversubscribe the budget.
   *
   * One count aggregate (map-side combined) + a broadcast-sized stratum
   * table: nothing here grows with corpus size except the count scan.
   */
  def temperatureWeights(df: DataFrame, stratumCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val counts = df.groupBy(stratumCol).agg(count(lit(1)).as("n_docs"))
      .withColumn("sqrt_n", sqrt(col("n_docs").cast(DoubleType)))
    val total = counts.agg(
      sum(col("sqrt_n").cast(DecimalType(28, 12))).cast(DoubleType).as("z"))
    counts.crossJoin(broadcast(total))
      .withColumn("share", col("sqrt_n") / col("z"))
      .withColumn("target_docs", floor(col("share") * budget).cast("long"))
      .drop("z")
  }
}
