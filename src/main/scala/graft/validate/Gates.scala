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

  /** The metadata's VALUE checks as (metric alias, counting column,
    * violation-count → message) triples — one conditional count per
    * declared constraint, so however many constraints a table declares,
    * validation is ONE aggregate (or one `observe`) over the frame:
    *  - `nullable: false` → count of NULLs;
    *  - `enum: [...]` → count of non-null values outside the set
    *    (compared as strings, the metadata's value space);
    *  - `pattern: "regex"` → count of non-null values not FULLY
    *    matching (etl_manager semantics: the pattern anchors the whole
    *    value, so `rlike` wraps it in ^(?:…)$).
    * Constraints on columns the frame does not carry are reported as
    * violations by [[columnSetGate]], not silently skipped here. */
  private def valueChecks(meta: TableMeta, present: Set[String])
      : Seq[(String, org.apache.spark.sql.Column, Long => String)] =
    meta.columns.filter(c => present.contains(c.name)).flatMap { c =>
      val v = col(c.name)
      val nn =
        if (c.nullable) Nil
        else Seq((s"nn_${c.name}",
          count(when(v.isNull, 1)).as(s"nn_${c.name}"),
          (n: Long) => s"column ${c.name}: $n null values in not-null column"))
      val en =
        if (c.enumValues.isEmpty) Nil
        else Seq((s"enum_${c.name}",
          count(when(v.isNotNull &&
            !v.cast("string").isin(c.enumValues: _*), 1))
            .as(s"enum_${c.name}"),
          (n: Long) => s"column ${c.name}: $n values outside enum " +
            c.enumValues.mkString("[", ", ", "]")))
      val pat = c.pattern.toSeq.map(p =>
        (s"re_${c.name}",
          count(when(v.isNotNull &&
            !v.cast("string").rlike(s"^(?:$p)$$"), 1)).as(s"re_${c.name}"),
          (n: Long) => s"column ${c.name}: $n values not matching " +
            s"pattern '$p'"))
      nn ++ en ++ pat
    }

  /** Metadata-declared VALUE gates (reference README.md:271: "test the
    * metadata schema fully (i.e. datatypes, enums, regex and
    * nullables)"): nullable / enum / regex conformance for every
    * declared constraint, accumulated into one [[GateResult]] with the
    * same report-everything contract as [[columnSetGate]]. One
    * aggregate job however many constraints the table declares. */
  def valueGates(df: DataFrame, meta: TableMeta): GateResult = {
    val checks = valueChecks(meta, df.columns.toSet)
    if (checks.isEmpty) return GateResult("values", passed = true, Nil)
    val row = df.agg(checks.head._2, checks.tail.map(_._2): _*).head()
    val errs = checks.zipWithIndex.flatMap { case ((_, _, msg), i) =>
      val n = row.getLong(i)
      if (n == 0) None else Some(msg(n))
    }
    GateResult("values", errs.isEmpty, errs)
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

  /** Metadata-driven single-pass validated write: the column-set gate
    * runs on the schema up front (free), then ALL of the metadata's
    * value constraints (nullable/enum/regex) ride the write job's own
    * `observe` metrics alongside the row count — zero extra scans
    * however many constraints the table declares, and validation sees
    * exactly the rows that landed. Same inflight-promote and
    * accumulate-then-abort contract as the explicit-columns overload. */
  def gatedWrite(df: DataFrame, path: String, minRows: Long,
      meta: TableMeta): GateResult = {
    val colGate = columnSetGate(df, meta)
    if (!colGate.passed) throw new GateFailure(colGate)
    val checks = valueChecks(meta, df.columns.toSet)
    val obs = Observation()
    val metrics = count(lit(1)).as("rows") +: checks.map(_._2)
    val target = new org.apache.hadoop.fs.Path(path)
    val inflight = new org.apache.hadoop.fs.Path(path + ".__inflight")
    val fs = target.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    df.observe(obs, metrics.head, metrics.tail: _*)
      .write.mode("overwrite").parquet(inflight.toString)
    val m = obs.get
    val errs = checks.flatMap { case (alias, _, msg) =>
      val n = m(alias).asInstanceOf[Long]
      if (n == 0) None else Some(msg(n))
    }
    val result = colGate ++
      rowCountGate(m("rows").asInstanceOf[Long], minRows) ++
      GateResult("values", errs.isEmpty, errs)
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
