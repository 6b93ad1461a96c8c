package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Mergeable distinct-count sketches (Apache DataSketches HLL via Spark 4's
 * `hll_sketch_agg`/`hll_union_agg`/`hll_sketch_estimate`) — the
 * approximate twin of [[IncrementalAgg]]: a per-group sketch STATE table
 * that refreshes from delta batches without rescanning history, and
 * rolls up across group levels without re-reading data at all.
 *
 * Why sketches, not `countDistinct`, at 100 TB: exact distinct needs a
 * shuffle keyed by (group, value) — shuffle volume ∝ distinct pairs. The
 * sketch is a fixed ≤ 2^lgK-register buffer per group, built with map-side
 * combine; shuffle volume is |groups| × sketch size no matter how many
 * distinct values flow in. The union is set-semantic — associative,
 * commutative, idempotent — so re-delivered batches cannot inflate the
 * count and a region∪region rollup is a sketch union, not a rescan.
 * Caveat pinned by `ApproxDistinctSpec`: DataSketches HLL promotes
 * through sparse→dense modes as it grows, so two different ingest
 * histories of the SAME data can serve estimates a fraction of a percent
 * apart — refresh ≡ rebuild within error bounds, not bit-for-bit (which
 * is also why `q_distinct_sketch` is a rows-only query: the estimate is
 * reproducible for a fixed split, not portable across engines).
 */
object ApproxDistinct {

  /** Per-group HLL sketch state over `valueCol` (binary column `sk`). */
  def buildState(df: DataFrame, keys: Seq[String], valueCol: String,
      lgK: Int = 14): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(expr(s"hll_sketch_agg($valueCol, $lgK)").as("sk"))

  /** Fold a delta batch into existing state: sketch the delta, union by
    * group key. Cost ∝ |delta| + |groups|; history is never re-read. */
  def refresh(state: DataFrame, delta: DataFrame, keys: Seq[String],
      valueCol: String, lgK: Int = 14): DataFrame =
    state.unionByName(buildState(delta, keys, valueCol, lgK))
      .groupBy(keys.map(col): _*)
      .agg(expr("hll_union_agg(sk)").as("sk"))

  /** Serve estimates from state. */
  def serve(state: DataFrame, keys: Seq[String]): DataFrame =
    state.select(keys.map(col) :+
      expr("hll_sketch_estimate(sk)").as("approx_distinct"): _*)

  /** Roll state up to a coarser grouping (e.g. day→month) by sketch
    * union alone — no data rescan. */
  def rollup(state: DataFrame, coarserKeys: Seq[String]): DataFrame =
    state.groupBy(coarserKeys.map(col): _*)
      .agg(expr("hll_union_agg(sk)").as("sk"))

  /**
   * EXACT distinct count of a long column via mergeable roaring-style
   * bitmaps (`bitmap_construct_agg`) — the middle ground between
   * `countDistinct` and HLL: the two-level (group, bucket) aggregation
   * shuffles one ≤4 KB bitmap per 32768-value bucket instead of every
   * distinct value, the bitmap union is exact (so this CAN be oracled
   * against `COUNT(DISTINCT)` — see q_bitmap_distinct), and buckets make
   * it dense-domain-proof: memory ∝ occupied buckets. The right tool when
   * ids are integers and the count must be exact; HLL when a % error buys
   * a 100× smaller state.
   */
  def exactDistinctBitmap(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame = {
    val buckets = df
      .groupBy((keys.map(col) :+ expr(s"bitmap_bucket_number($valueCol)").as("__bkt")): _*)
      .agg(expr(s"bitmap_construct_agg(bitmap_bit_position($valueCol))").as("__bm"))
    buckets.groupBy(keys.map(col): _*)
      .agg(sum(expr("bitmap_count(__bm)")).as("exact_distinct"))
  }
}
