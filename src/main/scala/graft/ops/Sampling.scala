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

  /**
   * Stable train/val/test assignment from a content hash: the first two
   * hex chars of md5(key) split [0x00, 0x100) at `trainHex` and `valHex`
   * (defaults 0xcc/0xe6 ≈ 80/10/10). Shuffle-free — a pure projection —
   * and growth-stable: a document's split never changes as the corpus
   * grows, so no training example silently migrates into the eval set
   * between pipeline runs. md5 hex is engine-portable (unlike engine RNG
   * or xxhash64), so the assignment oracle-checks.
   */
  def hashSplit(df: DataFrame, keyCol: String,
      trainHex: String = "cc", valHex: String = "e6"): DataFrame = {
    val h = substring(md5(col(keyCol).cast("string")), 1, 2)
    df.withColumn("split",
      when(h < lit(trainHex), lit("train"))
        .when(h < lit(valHex), lit("val"))
        .otherwise(lit("test")))
  }

  /**
   * Stratum-balanced downsample: cap every stratum at the size of the
   * smallest one, members chosen by content-hash order (uniform and
   * deterministic, like [[stratifiedSample]]). The cap is a two-row-stage
   * aggregate (|strata| rows → 1 row) broadcast back, so the only
   * data-sized cost is the one stratum-keyed window shuffle.
   */
  def balancedSample(df: DataFrame, strataCols: Seq[String], keyCol: String): DataFrame = {
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    val cap = df.groupBy(strataCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .agg(min(col("__n")).as("__k"))
    df.withColumn("sample_rank", row_number().over(w))
      .crossJoin(broadcast(cap))
      .filter(col("sample_rank") <= col("__k"))
      .drop("__k")
  }

  /**
   * Deterministic weighted sampling without replacement, n items with
   * inclusion probability ∝ `weightCol` — Efraimidis–Spirakis A-Res: each
   * row draws u ∈ (0,1) from its content hash and ranks by ln(u)/w
   * descending (the one-shot equivalent of key u^(1/w); ln keeps the
   * magnitudes in a well-conditioned range instead of pow's denormals).
   * Corpus mixing's "sample documents ∝ quality score" primitive.
   *
   * u = (first 15 md5 hex chars)/2⁶⁰ — content-derived like every sampler
   * here, so the draw is reproducible across engines and partitionings.
   * The sort key is rounded to 9 dp (the engine's cross-engine IEEE
   * contract for transcendentals) with keyCol as tie-break; the heavy lift
   * is one global top-n, which Spark executes as per-partition heaps + a
   * driver merge (TakeOrderedAndProject), never a full sort.
   */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
      n: Int): DataFrame = {
    // the engine-wide 60-bit content hash (ApproxDistinct.kmvHash is the
    // one definition the DuckDB oracles mirror); long→double and
    // string→double of the same exact integer round identically
    val u = ApproxDistinct.kmvHash(col(keyCol))
      .cast("double") / lit(math.pow(2.0, 60.0))
    // rescale by 1e6 BEFORE the 9-dp round: ln(u)/weight is ~1e-8 for
    // large weights, where a raw 9-dp grid keeps ~1 significant digit and
    // the top-n boundary lands inside mass ties that a last-ulp ln()
    // difference across engines can flip; at 1e6 the grid carries ~7
    // significant digits and the rank order is stable
    val key = round(log(u) / col(weightCol).cast("double") * lit(1e6), 9)
    df.withColumn("sample_key", key)
      .orderBy(col("sample_key").desc, col(keyCol))
      .limit(n)
  }
}
