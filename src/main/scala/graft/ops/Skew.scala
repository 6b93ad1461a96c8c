package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew mitigation for joins and aggregations. AQE's skew-join handling
 * (on by default) covers sort-merge joins at runtime; explicit salting is
 * the plan-level tool when one side has pathological hot keys — e.g. a
 * web-scale corpus where one dedup bucket holds 1% of all documents.
 */
object Skew {

  /** Deterministic salt in [0, buckets) derived from arbitrary columns —
    * no RNG state, so retries and speculative tasks agree. */
  def salt(buckets: Int, cols: Column*): Column = pmod(hash(cols: _*), lit(buckets))

  /**
   * Salted inner equi-join for a skewed LEFT side: left rows get a
   * deterministic salt, the (smaller) right side is replicated `buckets`
   * times, and the join key becomes (key, salt) — hot keys spread over
   * `buckets` reducers instead of one. Cost: right side × buckets, so use
   * for dimension-sized right sides with a skewed fact on the left.
   */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      buckets: Int,
      saltBy: Seq[String]): DataFrame = {
    val saltedLeft = left.withColumn("__salt", salt(buckets, saltBy.map(col): _*))
    val saltedRight = right
      .withColumn("__salt", explode(array((0 until buckets).map(lit): _*)))
    saltedLeft.join(saltedRight, Seq(key, "__salt")).drop("__salt")
  }

  /**
   * Two-phase (salted) aggregation for skewed group keys: partial
   * aggregate on (key, salt), then final aggregate on key. For algebraic
   * aggregates Spark's partial+final HashAggregate already does this
   * map-side; the explicit form matters for `collect_list`-style or
   * high-cardinality-combiner aggregations where one hot key would
   * otherwise land on one reducer.
   */
  def saltedCount(df: DataFrame, key: String, buckets: Int, saltBy: Seq[String]): DataFrame =
    df.withColumn("__salt", salt(buckets, saltBy.map(col): _*))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("n"))
}
