package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling operators for training-data mixture construction.
 * Engine-RNG `df.sample` cannot be oracle-checked (and is not reproducible
 * across engines/versions), so both operators derive their "randomness"
 * from content hashes — stable across runs, engines, and partitionings.
 */
object Sampling {

  /**
   * Fixed-size per-stratum sample: the n rows of each stratum ranking
   * first by md5 of the key (a content-derived uniform order), keyCol as
   * tie-break. The building block of corpus mixing — "20 documents per
   * language", "1M pages per domain bucket".
   *
   * One shuffle on the strata columns. When n is small and strata are
   * huge/skewed, the bounded-heap form ([[TopK.topKByGroup]]) carries only
   * |strata|·n rows through the shuffle instead of sorting every row;
   * this window form is the reference semantics both agree on.
   */
  def stratifiedSample(df: DataFrame, strataCols: Seq[String], n: Int,
      keyCol: String): DataFrame = {
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= n)
  }

  /**
   * Deterministic fractional sample: keep a row iff the last `buckets`-bucket
   * of its key hash falls below `keep` (keep/buckets ≈ the sampling rate).
   * Shuffle-free (pure filter, pushes into the scan) and stable under
   * corpus growth — a document's membership never changes as others arrive,
   * so incremental pipeline runs sample consistently.
   */
  def hashSample(df: DataFrame, keyCol: String, keep: Int, buckets: Int): DataFrame =
    df.filter(
      pmod(xxhash64(col(keyCol).cast("string")), lit(buckets)) < keep)
}
