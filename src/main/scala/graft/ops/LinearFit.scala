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
   * long-form frame (coef: b0|b1|b2|r2, value: double), 4 rows. With
   * `groupCols` set, fits ONE INDEPENDENT MODEL PER GROUP in the same
   * single aggregate — the "thousands of per-stratum models in one corpus
   * pass" shape (shuffle: one 10-decimal row per group).
   */
  def fitOls2(df: DataFrame, yCol: String, x1Col: String, x2Col: String,
      groupCols: Seq[String] = Nil): DataFrame = {
    val x1 = col(x1Col).cast(D)
    val x2 = col(x2Col).cast(D)
    val y = col(yCol).cast(D)
    def d(c: Column): Column = c.cast(DoubleType)
    val aggs = Seq(
      d(count(lit(1))).as("n"),
      d(sum(x1)).as("sx1"), d(sum(x2)).as("sx2"), d(sum(y)).as("sy"),
      d(sum(x1 * x1)).as("sx1x1"), d(sum(x1 * x2)).as("sx1x2"),
      d(sum(x2 * x2)).as("sx2x2"),
      d(sum(x1 * y)).as("sx1y"), d(sum(x2 * y)).as("sx2y"),
      d(sum(y * y)).as("syy"))
    val stats =
      if (groupCols.isEmpty) df.agg(aggs.head, aggs.tail: _*)
      else df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)

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

    val solved = stats.withColumn(
      "det",
      det3(col("n"), col("sx1"), col("sx2"),
        col("sx1"), col("sx1x1"), col("sx1x2"),
        col("sx2"), col("sx1x2"), col("sx2x2")))
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
    val withR2 = solved.withColumn(
      "r2",
      (lit(1.0) -
        (col("syy") - (col("b0") * col("sy") + col("b1") * col("sx1y") +
          col("b2") * col("sx2y"))) /
          (col("syy") - col("sy") * col("sy") / col("n"))))

    withR2.select(groupCols.map(col) :+ expr(
      "stack(4, 'b0', b0, 'b1', b1, 'b2', b2, 'r2', r2) AS (coef, value)"): _*)
  }

  /**
   * Power-law fit per group: ln y = a + b·ln x ⟺ y ≈ eᵃ·xᵇ — the
   * scaling-law / Heaps'-law estimator (e.g. vocabulary-vs-corpus-size,
   * length-vs-tokens elasticity). One regressor, so the solve is the
   * closed 2×2 form: b = (n·Σxy − Σx·Σy) / (n·Σx² − Σx·Σx),
   * a = (Σy − b·Σx) / n.
   *
   * Portability of REAL-valued features: each ln goes through the
   * repo-wide 9-dp rounding contract (`round(ln(v), 9)` — the only libm
   * call, identical on both engines after rounding); each product of two
   * 9-dp doubles is one IEEE multiply THEN `round(·, 9)` — the q_chi2 /
   * q_entropy contract for nonlinear terms, because casting a raw double
   * product straight into a decimal is double-rounding territory where
   * engines legitimately differ by an ulp — and only then summed as
   * exact DECIMAL(28,12); the final divisions are pinned IEEE ops. Rows
   * with y ≤ 0 or x ≤ 0 are excluded (no ln).
   */
  def fitPowerLaw(df: DataFrame, yCol: String, xCol: String,
      groupCols: Seq[String] = Nil): DataFrame = {
    val P = DecimalType(28, 12)
    val lx = round(log(col(xCol).cast(DoubleType)), 9)
    val ly = round(log(col(yCol).cast(DoubleType)), 9)
    def d(c: Column): Column = c.cast(DoubleType)
    val base = df.filter(col(xCol) > 0 && col(yCol) > 0)
      .select(groupCols.map(col) :+ lx.as("lx") :+ ly.as("ly"): _*)
    val aggs = Seq(
      d(count(lit(1))).as("n"),
      d(sum(col("lx").cast(P))).as("sx"), d(sum(col("ly").cast(P))).as("sy"),
      d(sum(round(col("lx") * col("lx"), 9).cast(P))).as("sxx"),
      d(sum(round(col("lx") * col("ly"), 9).cast(P))).as("sxy"))
    val stats =
      if (groupCols.isEmpty) base.agg(aggs.head, aggs.tail: _*)
      else base.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    stats
      .withColumn("b",
        (col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")))
      .withColumn("a", (col("sy") - col("b") * col("sx")) / col("n"))
      .select(groupCols.map(col) :+ col("a") :+ col("b") :+ col("n"): _*)
  }
}
