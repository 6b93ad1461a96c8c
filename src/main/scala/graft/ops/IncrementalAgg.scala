package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Incremental aggregate maintenance: refresh a grouped rollup with a new
 * batch WITHOUT rescanning the full history — the materialized-view
 * maintenance shape that matters most at 100 TB, where "recompute the
 * rollup" means re-reading the whole fact table but "fold in today's
 * partition" reads only the delta.
 *
 * The state table carries only MERGEABLE partial aggregates — count, sum,
 * min, max — each with a ⊕ that is associative and commutative, so
 *
 *   state(A ∪ B) = state(A) ⊕ state(B)
 *
 * holds for ANY split of the data, and non-mergeable outputs (avg) are
 * derived at read time from mergeable parts. Sums go through exact
 * decimals, so ⊕ is not just associative in theory but bit-for-bit:
 * refreshed state hash-matches a from-scratch rebuild (the q_incr_rollup
 * oracle proves exactly this).
 */
object IncrementalAgg {

  /** Build the state table for `measure` grouped by `keys`. The sum lands
    * in DECIMAL(38,6) (Spark's sum-of-decimal(28,6) result type) so later
    * ⊕-merges neither overflow nor re-round. */
  def buildState(df: DataFrame, keys: Seq[String], measure: String): DataFrame = {
    val m = col(measure)
    df.groupBy(keys.map(col): _*)
      .agg(
        count(m).as("cnt"),
        sum(m.cast("decimal(28,6)")).as("sum_dec"),
        min(m).as("min_v"),
        max(m).as("max_v"))
  }

  /**
   * Fold a delta batch into existing state: aggregate the delta alone,
   * then ⊕-merge by group key — count/sum add, min/max combine. Cost is
   * one pass over the delta plus a shuffle of |groups|, independent of
   * how much history the state already summarizes.
   */
  def refresh(state: DataFrame, delta: DataFrame, keys: Seq[String], measure: String): DataFrame = {
    val deltaState = buildState(delta, keys, measure)
    state.unionByName(deltaState)
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("cnt")).as("cnt"),
        sum(col("sum_dec")).as("sum_dec"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))
  }

  /** Serve the rollup from state: derived avg from exact parts. */
  def serve(state: DataFrame, keys: Seq[String]): DataFrame =
    state.select(
      keys.map(col) ++ Seq(
        col("cnt"),
        col("sum_dec").cast("double").as("sum_v"),
        (col("sum_dec").cast("double") / col("cnt")).as("avg_v"),
        col("min_v"), col("max_v")): _*)
}
