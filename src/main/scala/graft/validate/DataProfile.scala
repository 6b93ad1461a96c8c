package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Per-column data profiling — the quantitative census a pipeline records
 * about every table it lands (the structural extension of the reference's
 * row-count and column-set gates, test_data.py:33-54): non-null count,
 * null count, distinct count, min and max per column, in ONE pass over
 * the data.
 *
 * Plan shape: all per-column aggregates ride in a single `agg` (one scan,
 * partial+final combine — profiling 30 columns costs one table pass, not
 * 30), and the single result row is `stack`ed into (column, stats) rows
 * driver-side-free. The `norm` function per column maps values into an
 * orderable profiling domain (e.g. money double → DECIMAL(18,2),
 * timestamp → DATE) BEFORE min/max so the extremes are
 * presentation-stable; they surface as strings post-aggregation.
 */
object DataProfile {

  def profile(df: DataFrame, cols: Seq[(String, Column => Column)]): DataFrame = {
    val aggs = cols.flatMap { case (c, norm) =>
      Seq(
        count(col(c)).as(s"${c}__nn"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nul"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(norm(col(c))).cast("string").as(s"${c}__min"),
        max(norm(col(c))).cast("string").as(s"${c}__max"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { case (c, _) =>
      s"'$c', ${c}__nn, ${c}__nul, ${c}__nd, ${c}__min, ${c}__max"
    }.mkString(", ")
    row.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS (column, n_nonnull, n_null, n_distinct, min_s, max_s)")
  }
}
