package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/**
 * Mergeable equi-width histogram sketch for approximate quantiles — the
 * deterministic counterpart of GK/KLL summaries. Spark's own
 * `approx_percentile` state is insertion-order-dependent (compressing
 * summaries), so two runs of the same job can serve different estimates;
 * this sketch's state is a vector of INTEGER bin counts, which makes it
 *
 *  - order-independent: counts are a commutative monoid, so any
 *    partition/merge tree yields BIT-identical state (split-merge ≡
 *    one-pass is asserted in HistSketchSpec);
 *  - mergeable: ⊕ is element-wise add — per-partition partial states
 *    shuffle O(groups × bins) longs, never the values; incremental
 *    refresh folds a delta batch's state straight in;
 *  - bounded-error: a quantile estimate is off by at most one bin width,
 *    a STATIC guarantee chosen up front by (lo, hi, bins), where
 *    compressing sketches trade error bounds for adaptivity.
 *
 * The price is a fixed value domain [lo, hi) — the right trade when the
 * metric's range is policy-known (scores, latencies, prices), which is
 * exactly the 100 TB monitoring case: at 1000 executors the whole
 * per-group state is `bins` longs however many trillion rows fold in.
 *
 * Serving: nearest-rank target ⌈q·n⌉ located by a running-count scan of
 * the ≤`bins`-row state (the window is bounded by bins, NOT by data —
 * no unpartitioned data-sized window anywhere), then one linear
 * interpolation inside the landing bin. Every step is integer arithmetic
 * except the final `lo + w·(bin + frac)` — pinned IEEE ops, so a DuckDB
 * replay hash-matches on the approximate estimates.
 */
object HistSketch {

  /** Sparse per-group state: (groups..., bin, cnt). Values below lo clamp
    * into bin 0, values ≥ hi into bin bins−1 (total count is preserved —
    * a quantile sketch that silently drops outliers lies about ranks). */
  def buildState(df: DataFrame, groupCols: Seq[String], valueCol: String,
      lo: Double, hi: Double, bins: Int): DataFrame = {
    val w = lit((hi - lo) / bins)
    val raw = floor((col(valueCol).cast(DoubleType) - lit(lo)) / w).cast(LongType)
    val bin = least(greatest(raw, lit(0L)), lit(bins.toLong - 1L))
    df.withColumn("bin", bin)
      .groupBy((groupCols.map(col) :+ col("bin")): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** ⊕-merge of two states built with the same (lo, hi, bins). */
  def mergeStates(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy((groupCols.map(col) :+ col("bin")): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /**
   * Serve quantile estimates from state alone (no data rescan).
   * Output: (groups..., q, est) — one row per group × requested q.
   */
  def quantiles(state: DataFrame, groupCols: Seq[String], qs: Seq[Double],
      lo: Double, hi: Double, bins: Int): DataFrame = {
    val w = (hi - lo) / bins
    val grp = Window.partitionBy(groupCols.map(col): _*)
    val byBin = grp.orderBy(col("bin"))
    // Running count BEFORE this bin and group total: the state is ≤bins
    // rows per group, so these windows scan a bounded frame.
    val cum = state
      .withColumn("n", sum(col("cnt")).over(grp))
      .withColumn("cum_before",
        coalesce(sum(col("cnt")).over(byBin.rowsBetween(
          Window.unboundedPreceding, -1)), lit(0L)))
    val withQ = cum.withColumn("q", explode(array(qs.map(lit): _*)))
      // nearest-rank target, clamped to [1, n]
      .withColumn("target",
        least(greatest(ceil(col("q") * col("n")).cast(LongType), lit(1L)),
          col("n")))
      // the landing bin is the first whose cumulative count reaches target
      .filter(col("cum_before") < col("target") &&
        col("target") <= col("cum_before") + col("cnt"))
      .withColumn("frac",
        (col("target") - col("cum_before")).cast(DoubleType) /
          col("cnt").cast(DoubleType))
      .withColumn("est",
        lit(lo) + lit(w) * (col("bin").cast(DoubleType) + col("frac")))
    withQ.select((groupCols.map(col) :+ col("q") :+ col("est")): _*)
  }
}
