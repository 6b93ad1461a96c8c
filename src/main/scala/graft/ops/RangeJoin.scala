package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Bin-bucketed range join: `points.pt BETWEEN intervals.lo AND intervals.hi`
 * with NO equi-key. Spark plans the naive form as a broadcast nested loop —
 * fine while one side fits in memory, quadratic death at 100 TB. The
 * standard rewrite makes it a plain shuffled equi-join:
 *
 *  - every interval explodes to the bins of width `binWidth` it covers
 *    (replication factor = interval length / binWidth, so pick the width
 *    near the typical interval length);
 *  - every point maps to exactly ONE bin — hence no duplicate pairs and
 *    no post-join dedup;
 *  - the equi-join on bin is hash-partitioned (AQE-coalesced, skew-split),
 *    and the exact BETWEEN predicate re-applied after the join keeps the
 *    result identical to the naive form — proven by the oracle query,
 *    whose SQL is the PLAIN range join.
 *
 * Bin ids are `floor(x / binWidth)` over a numeric axis (epoch days/micros);
 * floor semantics make negative axes safe.
 */
object RangeJoin {

  def binnedRangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      ptCol: String,
      loCol: String,
      hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin", floor(col(ptCol) / binWidth).cast("long"))
    val iv = intervals.withColumn("__bin",
      explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    p.join(iv, "__bin")
      .filter(col(ptCol).between(col(loCol), col(hiCol)))
      .drop("__bin")
  }
}
