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
}
