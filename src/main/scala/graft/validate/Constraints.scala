package graft.validate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed row-level constraint checking — the queryable, scale-out
 * extension of [[Gates]] (reference test_data.py's accumulate-then-report
 * contract): every rule evaluates to ONE (rule, violations) row, all
 * rules union into a violations table, violations = 0 ⇔ pass. Because the
 * result is a DataFrame, the validate stage composes with the rest of the
 * engine — gate on it, write it to an audit zone, trend it over runs.
 *
 * Plan shape: each rule is a single pruned-scan aggregate (map-side
 * partial, scalar result); the FK rule is a broadcast-or-shuffled anti
 * join counting orphans. Nothing collects to the driver.
 */
object Constraints {

  /** Rows where `colName` is null. */
  def notNull(df: DataFrame, rule: String, colName: String): DataFrame =
    df.agg(sum(when(col(colName).isNull, 1L).otherwise(0L)).as("violations"))
      .select(lit(rule).as("rule"), coalesce(col("violations"), lit(0L)).as("violations"))

  /** Duplicate-key multiplicity: COUNT(*) − COUNT(DISTINCT keys). The
    * distinct runs over ONE struct of the key columns so a key tuple with
    * a null component still counts as a value (SQL row-value semantics,
    * what DuckDB's COUNT(DISTINCT (a, b)) does) — a bare multi-column
    * countDistinct would silently skip those rows and report phantom
    * violations. */
  def uniqueKey(df: DataFrame, rule: String, keyCols: Seq[String]): DataFrame =
    df.agg((count(lit(1)) -
      countDistinct(struct(keyCols.map(col): _*))).as("violations"))
      .select(lit(rule).as("rule"), col("violations"))

  /** Orphaned children: non-null FK values with no parent (SQL FK
    * semantics — null FKs pass). */
  def foreignKey(child: DataFrame, rule: String, childCol: String,
      parent: DataFrame, parentCol: String): DataFrame =
    child.filter(col(childCol).isNotNull)
      .join(parent.select(col(parentCol)), col(childCol) === col(parentCol), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit(rule).as("rule"), col("violations"))

  /** Values outside [lo, hi] (nulls are not range violations — pair with
    * [[notNull]] when both are required). */
  def inRange(df: DataFrame, rule: String, colName: String,
      lo: Double, hi: Double): DataFrame =
    df.agg(sum(when(col(colName).isNotNull
        && !col(colName).between(lo, hi), 1L).otherwise(0L)).as("violations"))
      .select(lit(rule).as("rule"), coalesce(col("violations"), lit(0L)).as("violations"))

  /** Values outside an allowed enumeration (reference README names the
    * accepted-values check as part of the real validate stage). Nulls
    * pass — pair with [[notNull]] when membership is also mandatory. */
  def inEnum(df: DataFrame, rule: String, colName: String,
      allowed: Seq[String]): DataFrame =
    df.agg(sum(when(col(colName).isNotNull
        && !col(colName).isin(allowed: _*), 1L).otherwise(0L)).as("violations"))
      .select(lit(rule).as("rule"), coalesce(col("violations"), lit(0L)).as("violations"))

  /** Values not fully matching a regex (anchored rlike — Java and RE2-ish
    * engines agree on this fragment class; keep patterns to the portable
    * subset). Nulls pass. */
  def matchesRegex(df: DataFrame, rule: String, colName: String,
      pattern: String): DataFrame =
    df.agg(sum(when(col(colName).isNotNull
        && !col(colName).rlike("^(?:" + pattern + ")$"), 1L).otherwise(0L)).as("violations"))
      .select(lit(rule).as("rule"), coalesce(col("violations"), lit(0L)).as("violations"))

  /** Batch-size floor (the reference's ≥100-rows gate): violations =
    * shortfall below `minRows`. */
  def minRows(df: DataFrame, rule: String, minRows: Long): DataFrame =
    df.agg(count(lit(1)).as("n"))
      .select(lit(rule).as("rule"),
        greatest(lit(0L), lit(minRows) - col("n")).as("violations"))

  /** The violations table: all rules, deterministic order. */
  def checkAll(rules: Seq[DataFrame]): DataFrame = {
    require(rules.nonEmpty, "Constraints.checkAll: no rules")
    rules.reduce(_ unionByName _).orderBy("rule")
  }
}
