package graft.align

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

import graft.meta.TableMeta

/**
 * Schema alignment: force a DataFrame to a declared metadata schema before
 * writing — select-subset, reorder to metadata order, cast to declared
 * types, optionally drop (partition) columns. Mirrors the reference's
 * `align_df_to_meta` (reference: glue_jobs/example_job/job.py:62,67;
 * README.md:369; SURVEY.md §2.1 O17).
 *
 * Cast semantics: the reference predates ANSI mode, so alignment uses
 * non-failing TRY_CAST (overflow/parse failure → null) rather than ANSI
 * CAST — e.g. `count(*)`'s LongType downcasts to the declared `int` of
 * meta_data/curated/calculated.json:14 without risk of a hard error.
 */
object Align {

  def tryCastCol(name: String, dt: DataType): Column =
    expr(s"try_cast(`$name` AS ${dt.sql})").as(name)

  /**
   * @param dropColumns columns to exclude from the output (typically
   *   `meta.partitions` when writing into an explicit partition path,
   *   reference job.py:67)
   * @param addMissingAsNull when the declared schema has a column the frame
   *   lacks (schema drift, SURVEY.md §1.4), emit a typed null instead of
   *   failing. Extra frame columns not in the metadata are always dropped
   *   (the reference's 36-col raw → 33-col curated reconciliation).
   */
  def alignToMeta(
      df: DataFrame,
      meta: TableMeta,
      dropColumns: Seq[String] = Nil,
      addMissingAsNull: Boolean = true): DataFrame = {
    val present = df.columns.toSet
    val keep = meta.columns.filterNot(c => dropColumns.contains(c.name))
    val missing = keep.filterNot(c => present.contains(c.name))
    if (missing.nonEmpty && !addMissingAsNull)
      throw new IllegalArgumentException(
        s"alignToMeta: frame missing declared columns: ${missing.map(_.name).mkString(", ")}")
    val cols: Seq[Column] = keep.map { c =>
      if (present.contains(c.name)) tryCastCol(c.name, c.sparkType)
      else lit(null).cast(c.sparkType).as(c.name)
    }
    df.select(cols: _*)
  }
}
