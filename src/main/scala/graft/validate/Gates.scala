package graft.validate

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions.{col, count, lit, when}

import graft.meta.TableMeta

/**
 * Data-quality gates run between land and raw-hist, before any curation
 * (reference: python_scripts/test_data.py; README.md:261-287; SURVEY.md
 * §2.1 O8-O9). Gate failures abort the pipeline stage; per the reference,
 * ALL failures are accumulated before raising (test_data.py:42-43) so one
 * run reports every problem at once.
 */
object Gates {

  final case class GateResult(gate: String, passed: Boolean, errors: Seq[String]) {
    def ++(other: GateResult): GateResult =
      GateResult(s"$gate+${other.gate}", passed && other.passed, errors ++ other.errors)
  }

  class GateFailure(val result: GateResult)
      extends RuntimeException(s"gate '${result.gate}' failed:\n  ${result.errors.mkString("\n  ")}")

  /** Row-count threshold (reference test_data.py:33-39: fail if < 100). */
  def rowCountGate(rowCount: Long, minRows: Long): GateResult =
    if (rowCount >= minRows) GateResult("row_count", passed = true, Nil)
    else GateResult("row_count", passed = false,
      Seq(s"row count $rowCount below required minimum $minRows"))

  def rowCountGate(df: DataFrame, minRows: Long): GateResult =
    rowCountGate(df.count(), minRows)

  /**
   * Column-set conformance: symmetric difference between observed columns
   * and the metadata's declared column names, with every mismatch reported
   * (reference test_data.py:21-22,41-54 computes `set(row) ^ set(meta)` per
   * row and accumulates). On a columnar frame the per-file union schema is
   * the observable surface, so we diff at frame granularity.
   */
  def columnSetGate(observed: Seq[String], meta: TableMeta, ignore: Set[String] = Set.empty): GateResult = {
    val obs = observed.toSet -- ignore
    val exp = meta.columnNames.toSet -- ignore
    val missing = (exp -- obs).toSeq.sorted.map(c => s"missing declared column: $c")
    val extra = (obs -- exp).toSeq.sorted.map(c => s"unexpected column not in metadata: $c")
    val errs = missing ++ extra
    GateResult("column_set", errs.isEmpty, errs)
  }

  def columnSetGate(df: DataFrame, meta: TableMeta): GateResult =
    columnSetGate(df.columns.toSeq, meta)

  /** Run all gates, accumulate every error, then throw once if any failed
    * (error-accumulation semantics of test_data.py:41-54). */
  def enforce(results: GateResult*): Unit = {
    val combined = results.reduce(_ ++ _)
    if (!combined.passed) throw new GateFailure(combined)
  }

  /**
   * Single-pass validated write: piggyback the gate metrics on the write
   * job itself via [[Observation]] instead of running `count()` first.
   * At 100 TB the count-then-write idiom reads the input twice (and under
   * non-deterministic upstreams can even gate on different data than it
   * writes); `df.observe` folds the row count and per-column null counts
   * into the write's own task metrics, so validation costs zero extra
   * scans and sees exactly the rows that landed.
   *
   * The batch lands in a sibling `.__inflight` directory and is promoted
   * to `path` only after every gate passes, so a failing (or mid-write
   * dying) batch can never damage the previous good output. Gate
   * failures follow the reference's accumulate-then-abort contract: the
   * inflight directory is deleted and ALL violations raise in one
   * [[GateFailure]]. Returns the passing [[GateResult]] otherwise.
   * The promote itself is the delete+rename swap — its brief window is
   * exactly the race [[graft.io.Manifest]] exists to close; use that for
   * snapshot-isolated zones.
   */
  def gatedWrite(df: DataFrame, path: String, minRows: Long,
      notNullCols: Seq[String] = Nil): GateResult = {
    val obs = Observation()
    val metrics = count(lit(1)).as("rows") +:
      notNullCols.map(c => count(when(col(c).isNull, 1)).as(s"nulls_$c"))
    val target = new org.apache.hadoop.fs.Path(path)
    val inflight = new org.apache.hadoop.fs.Path(path + ".__inflight")
    val fs = target.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    df.observe(obs, metrics.head, metrics.tail: _*)
      .write.mode("overwrite").parquet(inflight.toString)
    val m = obs.get
    val rows = m("rows").asInstanceOf[Long]
    val nullErrs = notNullCols.flatMap { c =>
      val n = m(s"nulls_$c").asInstanceOf[Long]
      if (n == 0) None else Some(s"column $c: $n null values in not-null column")
    }
    val result = rowCountGate(rows, minRows) ++
      GateResult("not_null", nullErrs.isEmpty, nullErrs)
    if (!result.passed) {
      fs.delete(inflight, true)
      throw new GateFailure(result)
    }
    fs.delete(target, true)
    if (!fs.rename(inflight, target))
      throw new RuntimeException(s"gatedWrite: promote failed for $path")
    result
  }
}
