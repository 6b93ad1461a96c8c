// The one file outside the graft namespace: private[sql] access to
// Dataset.ofRows, the supported way for an extension library to wrap a
// hand-built LogicalPlan back into a DataFrame (the same technique public
// Spark extension projects use). Nothing else may live in this package.
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{classic, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

object Bridge {
  /** Analyze + wrap a logical plan as a DataFrame on this session. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Wrap an already-RESOLVED catalyst expression as a [[Column]] —
    * attribute references keep their expression ids, so the column
    * binds by ID against frames built from the same plans (the DML
    * commands' technique for reusing the analyzer's own resolution of
    * MERGE/UPDATE expressions instead of re-resolving by name, which
    * would be ambiguous the moment target and source share column
    * names). Unresolved nodes are fine too: the frame's own analysis
    * pass resolves them against its child. */
  def columnOf(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.Column =
    new org.apache.spark.sql.Column(classic.ExpressionColumnNode(e))

  /** A V1 `StreamingRelation` over a registered stream provider — the
    * plan node `spark.readStream.format(fmt)...load()` produces, built
    * directly so a resolution rule can route `readStream.table(name)`
    * onto the same V1 source a path read uses. */
  def v1StreamingRelation(spark: SparkSession, format: String,
      options: Map[String, String],
      schema: Option[org.apache.spark.sql.types.StructType] = None)
      : LogicalPlan =
    org.apache.spark.sql.execution.streaming.runtime.StreamingRelation(
      org.apache.spark.sql.execution.datasources.DataSource(
        spark.asInstanceOf[classic.SparkSession],
        className = format, options = options,
        userSpecifiedSchema = schema))

  /** Wrap an InternalRow RDD as a frame with an explicit isStreaming
    * flag — what a V1 streaming Source must return from `getBatch`
    * (isStreaming = true), and what a V1 Sink needs to RE-wrap the
    * incremental batch it receives before running its own write action
    * on it (isStreaming = false; `ForeachBatchSink` does exactly this). */
  def internalFrame(spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType,
      isStreaming: Boolean): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming)
}
