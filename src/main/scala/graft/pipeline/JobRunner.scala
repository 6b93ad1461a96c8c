package graft.pipeline

import org.apache.spark.sql.SparkSession

/**
 * The one-image-many-jobs packaging contract: the reference ships a single
 * Docker image whose entrypoint dispatches on an env var
 * (`ENTRYPOINT python python_scripts/$PYTHON_SCRIPT_NAME`,
 * reference Dockerfile:13) and each job reads its parameters from the
 * environment (`IAM_ROLE`/`GITHUB_TAG`/`SNAPSHOT_DATE`,
 * run_glue_job.py:7-9; the DAG injects them per task,
 * dags/example_etl_dag.py:42-44). Re-expressed engine-side: one assembly,
 * `GRAFT_JOB` selects a registered pipeline, remaining `GRAFT_*` env vars
 * become the run's conf, `GRAFT_VERSION` the version stamp. Selection is
 * validated against the registry — an unknown job name fails loudly with
 * the known set, instead of the reference's silent shell interpolation.
 */
object JobRunner {

  /** Registry: job name → pipeline. One image, many jobs. */
  def jobs: Map[String, Pipeline] = Map(
    "reference_etl" -> ReferencePipeline.standard)

  /** Declared env→conf translation for the reference pipeline's keys
    * (env var names cannot carry the dotted conf naming). Unmapped
    * `GRAFT_<K>` vars pass through with the prefix stripped, for custom
    * stages. */
  val envKeyMap: Map[String, String] = Map(
    "LAND" -> ReferencePipeline.LandKey,
    "RAW_HIST" -> ReferencePipeline.RawHistKey,
    "CURATED" -> ReferencePipeline.CuratedKey,
    "META_DIR" -> ReferencePipeline.MetaDirKey,
    "TABLE" -> ReferencePipeline.TableKey,
    "LAND_TS" -> ReferencePipeline.LandTsKey,
    "SNAPSHOT_DATE" -> ReferencePipeline.SnapshotDateKey,
    "ROWS" -> ReferencePipeline.RowsKey,
    "MIN_ROWS" -> ReferencePipeline.MinRowsKey)

  def contextFromEnv(spark: SparkSession, env: Map[String, String],
      log: String => Unit = s => System.err.println(s"[job] $s")): PipelineContext = {
    val conf = env.collect {
      case (k, v) if k.startsWith("GRAFT_") && k != "GRAFT_JOB" && k != "GRAFT_VERSION" =>
        val short = k.stripPrefix("GRAFT_")
        envKeyMap.getOrElse(short, short) -> v
    }
    PipelineContext(spark, conf,
      version = env.getOrElse("GRAFT_VERSION", "v0"), log = log)
  }

  /** Select + run; returns the result instead of exiting so callers (and
    * specs) can assert on it. Unknown names throw with the known set. */
  def dispatch(spark: SparkSession, env: Map[String, String]): PipelineResult = {
    val name = env.getOrElse("GRAFT_JOB",
      throw new IllegalArgumentException(
        s"GRAFT_JOB not set; known jobs: ${jobs.keys.toSeq.sorted.mkString(", ")}"))
    val pipeline = jobs.getOrElse(name,
      throw new IllegalArgumentException(
        s"unknown job '$name'; known jobs: ${jobs.keys.toSeq.sorted.mkString(", ")}"))
    pipeline.run(contextFromEnv(spark, env))
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("GRAFT_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      // INT96 (the 4.x default) is deprecated AND carries no usable footer
      // stats - micros keeps timestamp columns data-skippable
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // sys.exit inside the try would terminate WITHOUT unwinding —
    // System.exit never runs finally blocks, so spark.stop() would be
    // left to Spark's shutdown hook (ADVICE r6). Record, stop, THEN exit.
    val code =
      try { if (dispatch(spark, sys.env).succeeded) 0 else 1 }
      finally spark.stop()
    if (code != 0) sys.exit(code)
  }
}
