package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/**
 * Multivariate ordinary-least-squares fit from EXACT sufficient
 * statistics — the "train a linear quality model over the whole corpus"
 * primitive (the fit-side twin of the applied linear margin in
 * `q_quality_margin`).
 *
 * Scale shape: one partial-aggregated pass computes the 10 sufficient
 * statistics (n, Σx₁, Σx₂, Σy, Σx₁², Σx₁x₂, Σx₂², Σx₁y, Σx₂y, Σy²) as
 * exact DECIMAL(38,0) sums of integer features — shuffle is ONE row of
 * ten decimals regardless of corpus size, and the normal-equation solve
 * is a constant-size projection on that row (never a driver collect, the
 * solve lives in the same lazy plan). With p features the stats are
 * O(p²) numbers and the solve O(p³) — flat in corpus size, the reason
 * normal equations beat gradient descent for small-p corpus models.
 *
 * Portability: the sums are exact integers; each is cast to double
 * (value-preserving under 2⁵³) and the 3×3 system is solved by Cramer's
 * rule as a FIXED tree of IEEE multiply/subtract/divide — deterministic
 * on every IEEE-754 engine, so a DuckDB oracle replaying the same tree
 * hash-matches bit-for-bit. No libm calls anywhere (R² is one final
 * division of dot products).
 */
object LinearFit {

  // 18 digits per factor so a product stays inside DECIMAL(38,0) on every
  // engine (DuckDB rejects wider decimal multiplies; Spark would silently
  // round). Features must therefore be < 1e18 per row — any per-document
  // integer count qualifies.
  private val D = DecimalType(18, 0)

  /**
   * Fit y ≈ b0 + b1·x1 + b2·x2 over integer-valued columns. Returns the
   * long-form frame (coef: b0|b1|b2|r2, value: double), 4 rows.
   */
  def fitOls2(df: DataFrame, yCol: String, x1Col: String, x2Col: String): DataFrame = {
    val x1 = col(x1Col).cast(D)
    val x2 = col(x2Col).cast(D)
    val y = col(yCol).cast(D)
    def d(c: Column): Column = c.cast(DoubleType)
    val stats = df.agg(
      d(count(lit(1))).as("n"),
      d(sum(x1)).as("sx1"), d(sum(x2)).as("sx2"), d(sum(y)).as("sy"),
      d(sum(x1 * x1)).as("sx1x1"), d(sum(x1 * x2)).as("sx1x2"),
      d(sum(x2 * x2)).as("sx2x2"),
      d(sum(x1 * y)).as("sx1y"), d(sum(x2 * y)).as("sx2y"),
      d(sum(y * y)).as("syy"))

    // Cramer's rule on A·b = v with A = [[n,sx1,sx2],[sx1,sx1x1,sx1x2],
    // [sx2,sx1x2,sx2x2]], v = [sy,sx1y,sx2y]. det3 expands each 3×3 the
    // same way (first-row cofactors) so Spark and the oracle share one
    // IEEE operation tree.
    def det3(a11: Column, a12: Column, a13: Column,
             a21: Column, a22: Column, a23: Column,
             a31: Column, a32: Column, a33: Column): Column =
      a11 * (a22 * a33 - a23 * a32) -
        a12 * (a21 * a33 - a23 * a31) +
        a13 * (a21 * a32 - a22 * a31)

    val solved = stats.select(
      col("*"),
      det3(col("n"), col("sx1"), col("sx2"),
        col("sx1"), col("sx1x1"), col("sx1x2"),
        col("sx2"), col("sx1x2"), col("sx2x2")).as("det"))
      .select(
        col("*"),
        (det3(col("sy"), col("sx1"), col("sx2"),
          col("sx1y"), col("sx1x1"), col("sx1x2"),
          col("sx2y"), col("sx1x2"), col("sx2x2")) / col("det")).as("b0"),
        (det3(col("n"), col("sy"), col("sx2"),
          col("sx1"), col("sx1y"), col("sx1x2"),
          col("sx2"), col("sx2y"), col("sx2x2")) / col("det")).as("b1"),
        (det3(col("n"), col("sx1"), col("sy"),
          col("sx1"), col("sx1x1"), col("sx1y"),
          col("sx2"), col("sx1x2"), col("sx2y")) / col("det")).as("b2"))

    // R² = 1 − SSE/SST with SSE = Σy² − (b0Σy + b1Σx1y + b2Σx2y) and
    // SST = Σy² − (Σy)²/n — every input already exact, three IEEE
    // multiplies + subtractions + one division.
    val withR2 = solved.select(
      col("b0"), col("b1"), col("b2"),
      (lit(1.0) -
        (col("syy") - (col("b0") * col("sy") + col("b1") * col("sx1y") +
          col("b2") * col("sx2y"))) /
          (col("syy") - col("sy") * col("sy") / col("n"))).as("r2"))

    withR2.select(expr(
      "stack(4, 'b0', b0, 'b1', b1, 'b2', b2, 'r2', r2) AS (coef, value)"))
  }
}
