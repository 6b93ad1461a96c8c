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

  // The executed plan's root is usually AdaptiveSparkPlanExec (empty
  // metrics) whose final plan nests in QueryStageExec wrappers — and
  // QueryStageExec is a LEAF in tree traversal, so collectFirst never
  // descends into it. Recurse through both wrappers explicitly and take
  // the topmost real node carrying numOutputRows.
  private def findOutputRows(p: org.apache.spark.sql.execution.SparkPlan): Option[Long] =
    p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        findOutputRows(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        if (q.metrics.contains("numOutputRows")) Some(q.metrics("numOutputRows").value)
        else findOutputRows(q.plan)
      case n if n.metrics.contains("numOutputRows") =>
        Some(n.metrics("numOutputRows").value)
      case n =>
        n.children.iterator.map(findOutputRows).collectFirst { case Some(v) => v }
    }

  private def outputRows(qe: QueryExecution): Option[Long] =
    findOutputRows(qe.executedPlan)

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
