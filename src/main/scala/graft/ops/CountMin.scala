package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) as a
 * QUERYABLE STATE TABLE: `depth` hash rows × `width` counters, one frame
 * row per non-empty (r, bucket). The frequency estimate for an item is
 * the MIN over rows of its bucket's counter — always ≥ the true count
 * (one-sided error ≤ e·N/width with probability 1−e^−depth).
 *
 * The companion of [[FreqItems]]' Misra-Gries: MG answers "which items
 * are frequent", CMS answers "how frequent is THIS item" for arbitrary
 * later probes without rescanning the corpus.
 *
 * Scale shape: the build is one explode(depth) + hash-aggregate whose
 * map-side combine caps every partition's contribution at depth×width
 * rows, so the shuffle carries ≤ depth·width·partitions counters no
 * matter how many tokens stream through — state size is INDEPENDENT of
 * vocabulary. States merge by counter addition ([[merge]]): associative
 * and commutative, so per-batch sketches roll up without rescan (the
 * ⊕-merge contract of `IncrementalAgg`; NOT idempotent — redelivered
 * batches must be deduplicated upstream, unlike the KMV set-union state).
 *
 * Hashes are the engine-wide portable md5-60bit family (`r:item` salted
 * per row), so an oracle can rebuild the identical sketch in SQL and the
 * approximate estimates hash-match exactly.
 */
object CountMin {

  /** Bucket of `item` in sketch row `r`: portable md5-60bit of "r:item"
    * mod width. */
  def bucket(item: Column, r: Int, width: Int): Column =
    pmod(
      conv(substring(md5(concat(lit(r.toString), lit(":"), item.cast("string"))), 1, 15), 16, 10)
        .cast(LongType),
      lit(width.toLong))

  private def rbPairs(item: Column, depth: Int, width: Int): Column =
    array((0 until depth).map(r =>
      struct(lit(r).as("r"), bucket(item, r, width).as("b"))): _*)

  /** Sketch state for `itemCol`: one row per touched (r, b) with counter
    * `c`. Null items are excluded (match SQL COUNT semantics). */
  def buildState(df: DataFrame, itemCol: String,
      depth: Int = 4, width: Int = 1024): DataFrame =
    df.filter(col(itemCol).isNotNull)
      .select(explode(rbPairs(col(itemCol), depth, width)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("c"))

  /** ⊕-merge two sketch states built with the same (depth, width):
    * counter addition per (r, b). */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("r", "b").agg(sum("c").as("c"))

  /** Point-frequency estimates for the items in `items(itemCol)`:
    * min-over-rows of the probed counters; never-seen items estimate 0.
    * Probe cost: |items|·depth joined against the ≤ depth·width state —
    * broadcast-sized by construction. */
  def estimate(state: DataFrame, items: DataFrame, itemCol: String,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    val probes = items
      .select(col(itemCol), explode(rbPairs(col(itemCol), depth, width)).as("rb"))
      .select(col(itemCol), col("rb.r").as("r"), col("rb.b").as("b"))
    probes.join(broadcast(state), Seq("r", "b"), "left")
      .groupBy(col(itemCol))
      .agg(min(coalesce(col("c"), lit(0L))).as("cms_count"))
  }
}
