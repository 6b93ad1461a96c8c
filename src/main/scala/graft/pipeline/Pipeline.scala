package graft.pipeline

import org.apache.spark.sql.SparkSession

/**
 * Sequential fail-fast orchestration — the engine-local equivalent of the
 * reference's 4-task linear Airflow DAG (reference dags/example_etl_dag.py:
 * 36-106, deps at :104-106; SURVEY.md §2.1 O23). Every stage reads from
 * zone N and writes to zone N+1 (never the same path — the A→A overwrite
 * race, README.md:619-637); state passes between stages only through
 * storage paths carried in the context, never in memory.
 */
final case class PipelineContext(
    spark: SparkSession,
    conf: Map[String, String] = Map.empty,
    /** version stamp applied to every curated row (reference README.md:97) */
    version: String = "v0",
    log: String => Unit = s => System.err.println(s"[pipeline] $s")) {
  def apply(key: String): String =
    conf.getOrElse(key, throw new NoSuchElementException(s"pipeline conf missing: $key"))
}

trait Stage {
  def name: String
  def run(ctx: PipelineContext): Unit
}

final case class StageReport(stage: String, succeeded: Boolean, durationMs: Long, error: Option[Throwable])
final case class PipelineResult(reports: Seq[StageReport]) {
  def succeeded: Boolean = reports.forall(_.succeeded)
}

final class Pipeline(stages: Seq[Stage]) {
  /** Run stages in order; a failure stops the run (linear hard deps, like
    * the reference DAG) but is reported, not thrown. */
  def run(ctx: PipelineContext): PipelineResult = {
    val reports = Seq.newBuilder[StageReport]
    var failed = false
    stages.foreach { s =>
      if (!failed) {
        val t0 = System.nanoTime()
        ctx.log(s"stage ${s.name}: start")
        try {
          s.run(ctx)
          reports += StageReport(s.name, succeeded = true, (System.nanoTime() - t0) / 1000000, None)
          ctx.log(s"stage ${s.name}: ok")
        } catch {
          case e: Throwable =>
            failed = true
            reports += StageReport(s.name, succeeded = false, (System.nanoTime() - t0) / 1000000, Some(e))
            ctx.log(s"stage ${s.name}: FAILED — ${e.getMessage}")
        }
      }
    }
    PipelineResult(reports.result())
  }
}
