package graft.pipeline

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/**
 * Engine-level run observability — the structural version of the
 * reference's per-stage verbose logging (README.md:255,
 * write_data_to_land.py:32-33, test_data.py:30): every completed action
 * is recorded with wall-clock, output row count (from the executed plan's
 * own metrics, not a second count() pass), and failure cause, queryable
 * as a table after a run.
 *
 * At scale this is the hook a metrics pipeline attaches to (one listener
 * per session, events pushed to the metrics store); locally the in-memory
 * ring suffices and PipelineSpec asserts the contract.
 */
final case class ActionRecord(
    action: String,
    durationNs: Long,
    outputRows: Option[Long],
    error: Option[String])

final class RunRecorder extends QueryExecutionListener {
  private val records = new ConcurrentLinkedQueue[ActionRecord]()

  private def outputRows(qe: QueryExecution): Option[Long] = {
    // the root is usually AdaptiveSparkPlanExec (empty metrics) or
    // WholeStageCodegenExec (only pipelineTime) — unwrap AQE to its final
    // plan, then take the TOPMOST node that actually carries the metric
    val root = qe.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    root.collectFirst {
      case n if n.metrics.contains("numOutputRows") => n.metrics("numOutputRows").value
    }
  }

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
    records.add(ActionRecord(funcName, durationNs, outputRows(qe), None))

  override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
    records.add(ActionRecord(funcName, 0L, None, Option(exception.getMessage)))

  def snapshot(): Seq[ActionRecord] = records.iterator().asScala.toSeq
  def clear(): Unit = records.clear()
}

object Observability {
  /** Attach a fresh recorder to the session; caller keeps the handle. */
  def attach(spark: SparkSession): RunRecorder = {
    val r = new RunRecorder
    spark.listenerManager.register(r)
    r
  }

  def detach(spark: SparkSession, r: RunRecorder): Unit =
    spark.listenerManager.unregister(r)
}
