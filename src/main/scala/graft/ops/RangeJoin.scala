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

  /**
   * Interval×interval OVERLAP join (`[loL,hiL] ∩ [loR,hiR] ≠ ∅`, closed
   * ends), optionally under equi-`keys` — the two-sided sibling of
   * [[binnedRangeJoin]], same rewrite: both sides explode to the bins
   * they cover and the theta join becomes a shuffled equi-join on
   * (keys, bin) with the exact overlap predicate re-applied.
   *
   * A pair can share SEVERAL bins; a distinct would re-shuffle the whole
   * output, so instead each pair is attributed to exactly ONE canonical
   * bin — the bin containing the overlap's start `max(loL, loR)` (always
   * a shared bin: the overlap start lies in both intervals). Emitted
   * once, no dedup shuffle, bit-identical to the naive form — proven by
   * the oracle, whose SQL is the PLAIN overlap join.
   *
   * Caller renames clashing payload columns (self-joins especially);
   * `keys` columns must carry the same name on both sides.
   */
  def binnedIntervalJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      loL: String, hiL: String,
      loR: String, hiR: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def explodeBins(df: DataFrame, lo: String, hi: String) =
      df.withColumn("__bin", explode(sequence(
        floor(col(lo) / binWidth).cast("long"),
        floor(col(hi) / binWidth).cast("long"))))
    explodeBins(left, loL, hiL)
      .join(explodeBins(right, loR, hiR), keys :+ "__bin")
      .filter(col(loL) <= col(hiR) && col(loR) <= col(hiL))
      .filter(floor(greatest(col(loL), col(loR)) / binWidth).cast("long") === col("__bin"))
      .drop("__bin")
  }
}
