package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Time-series relational operators Spark lacks as built-ins, composed from
 * existing operators so Catalyst keeps optimizing them (preference (a) of
 * the custom-operator ladder — no custom plan nodes needed).
 */
object TimeOps {

  /**
   * Backward as-of join: for each left row, attach the payload of the most
   * recent right row with the same key and `rightTs <= leftTs` (nulls when
   * no such row) — DuckDB `ASOF LEFT JOIN` semantics.
   *
   * Implementation is the *linear* union trick, not a quadratic
   * join-filter-reaggregate: tag sides, union by name, then a single
   * running `last(ignoreNulls)` window per key ordered by (ts, side)
   * carries the latest right payload into each left row. One shuffle on
   * the key, one sort — the shape that survives 100 TB, because cost is
   * O(n log n) per key-partition instead of O(left × right) per key.
   *
   * Right rows sort before left rows at equal timestamps, so equality
   * matches (ASOF `>=`). Caller pre-renames right payload columns to avoid
   * clashes with left columns.
   *
   * Determinism: the whole right payload travels as ONE struct through a
   * single `last(ignoreNulls)` window, so every output column comes from
   * the same right row, and the struct itself is the final sort key — when
   * two right rows tie on (key, ts), the greatest payload wins,
   * deterministically, run after run.
   */
  def asofJoinBackward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String]): DataFrame = {
    val l = left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))
    // ASOF is an equi-join on the key: NULL = NULL must NOT match, but
    // Window.partitionBy groups null keys together — drop null-key right
    // rows so null-key left rows fall through to a null payload
    val r = right.filter(col(key).isNotNull).select(
      col(key), col(rightTs).as("__ts"),
      struct(rightPayload.map(col): _*).as("__r_payload"))
      .withColumn("__side", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key)
      .orderBy(col("__ts"), col("__side"), col("__r_payload"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = u.withColumn("__p", last(col("__r_payload"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select(left.columns.map(col) ++ rightPayload.map(c => col(s"__p.$c").as(c)): _*)
  }

  /**
   * Forward as-of join: for each left row, attach the payload of the
   * NEAREST FOLLOWING right row with the same key and `rightTs >= leftTs`
   * (nulls when none) — the mirror of [[asofJoinBackward]], same linear
   * union + carry shape. Left rows sort before right rows at equal
   * timestamps so equality matches; a `first(ignoreNulls)` over the
   * forward-unbounded frame carries the next right payload back. Ties on
   * (key, ts) resolve to the smallest payload struct, deterministically.
   */
  def asofJoinForward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String]): DataFrame = {
    val l = left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(0))
    // see asofJoinBackward: NULL keys never match in an ASOF equi-join
    val r = right.filter(col(key).isNotNull).select(
      col(key), col(rightTs).as("__ts"),
      struct(rightPayload.map(col): _*).as("__r_payload"))
      .withColumn("__side", lit(1))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key)
      .orderBy(col("__ts"), col("__side"), col("__r_payload"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = u.withColumn("__p", first(col("__r_payload"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 0)
      .select(left.columns.map(col) ++ rightPayload.map(c => col(s"__p.$c").as(c)): _*)
  }

  /**
   * Per-key exponentially weighted moving average over a time-ordered
   * series: e_1 = x_1, e_i = α·x_i + (1−α)·e_{i−1}. The recurrence is
   * inherently sequential per key, so the scale-correct shape is one
   * hash-partition shuffle on the key and a linear in-memory fold per
   * group — `collect_list` into an `array_sort`ed struct array (sorting by
   * (ts, tieBreak) makes collection order irrelevant, hence deterministic
   * under any partitioning), then a single left-to-right `aggregate` fold.
   * No window-function state, no cross-row UDF; per-key memory is the
   * series length, the same bound any exact sequential recurrence needs.
   *
   * Output: one row per key — (key, n, ewma) with ewma rounded to 9 dp
   * (the engine-portable cut for IEEE-sequence-identical folds).
   */
  def ewma(
      df: DataFrame,
      key: String,
      tsCol: String,
      valCol: String,
      alpha: Double,
      tieBreak: String): DataFrame = {
    val series = array_sort(collect_list(struct(col(tsCol), col(tieBreak), col(valCol))))
    val vals = transform(series, s => s.getField(valCol))
    val fold = aggregate(
      slice(vals, lit(2), size(vals) - 1),
      element_at(vals, 1),
      (acc, v) => lit(alpha) * v + lit(1.0 - alpha) * acc)
    df.groupBy(col(key))
      .agg(count(lit(1)).as("n"), round(fold, 9).as("ewma"))
  }

  /**
   * Gap-based sessionization: events of one key belong to the same session
   * until a silence longer than `gap` (same unit as the numeric `tsCol`).
   * Two windows (lag + running sum), one shuffle on the key — the standard
   * batch formulation; the streaming twin lives in
   * graft.streaming.EventStreams.
   *
   * Output: one row per (key, session_id) with n_events, start_ts/end_ts.
   */
  def sessionize(
      events: DataFrame,
      key: String,
      tsCol: String,
      gap: Long): DataFrame = {
    val byKey = Window.partitionBy(key).orderBy(col(tsCol))
    val running = byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col(tsCol), 1).over(byKey)
    events
      .withColumn("__is_new",
        when(prev.isNull || (col(tsCol) - prev) > gap, 1).otherwise(0))
      .withColumn("session_id", sum(col("__is_new")).over(running))
      .groupBy(col(key), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("start_ts"),
        max(col(tsCol)).as("end_ts"))
  }
}
