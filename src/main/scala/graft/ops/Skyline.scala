package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * 2-D skyline (Pareto frontier): the rows not dominated by any other —
 * A dominates B when A is ≤ on the minimized column, ≥ on the maximized
 * column, and strictly better on at least one. The classic formulation is
 * a quadratic NOT EXISTS self-join; for two dimensions the frontier is a
 * STAIRCASE, recoverable from running maxima over the distinct values of
 * the minimized column.
 *
 * Scale shape: one aggregation to |distinct minimize-values| rows, the
 * staircase (running maxima) over THAT reduced frame via the distributed
 * two-pass prefix scan of [[PrefixSum.staircaseMax]] — no zero-partition
 * window even when the minimized column is continuous and |distinct| ≈
 * |rows| — and a broadcast join back: the full table is never
 * self-joined, never globally sorted. The per-row dominance test is two
 * broadcast-hash-joined comparisons inside codegen.
 */
object Skyline {

  /**
   * Rows of `df` on the Pareto frontier of (minimize `minCol`, maximize
   * `maxCol`). Duplicate frontier points all survive (dominance requires
   * strict improvement somewhere). Null handling: rows with a null in
   * either dimension are not comparable and are dropped.
   *
   * Staircase test for row B:
   *  - `run_lt`  = max(maxCol) over rows with minCol <  B.minCol:
   *    run_lt ≥ B.maxCol ⇒ a strictly cheaper row is at least as good ⇒
   *    dominated;
   *  - `run_le` = max(maxCol) over rows with minCol ≤ B.minCol:
   *    run_le > B.maxCol ⇒ a same-or-cheaper row is strictly better ⇒
   *    dominated;
   *  - otherwise B is on the frontier.
   */
  def skyline2d(df: DataFrame, minCol: String, maxCol: String): DataFrame = {
    val in = df.filter(col(minCol).isNotNull && col(maxCol).isNotNull)
    val perV = in.groupBy(col(minCol)).agg(max(col(maxCol)).as("__mx"))
    val stairs = PrefixSum.staircaseMax(perV, minCol, "__mx", "__run_le", "__run_lt")
      .select(col(minCol), col("__run_le"), col("__run_lt"))
    in.join(broadcast(stairs), Seq(minCol))
      .filter((col("__run_lt").isNull || col("__run_lt") < col(maxCol))
        && col("__run_le") <= col(maxCol))
      .drop("__run_le", "__run_lt")
      .select(df.columns.map(col): _*)
  }
}
