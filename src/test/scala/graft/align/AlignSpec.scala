package graft.align

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.meta.{ColumnMeta, TableMeta}

class AlignSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.session
  import spark.implicits._

  val meta = TableMeta("t", "parquet", Seq(
    ColumnMeta("a", "character"),
    ColumnMeta("n", "int"),
    ColumnMeta("part_col", "date")),
    partitions = Seq("part_col"))

  test("align selects, reorders, casts, and drops extra columns (O17)") {
    // frame has extra column `junk`, wrong order, long `n` (like count(*))
    val df = Seq((5L, "x", 1.5), (7L, "y", 2.5)).toDF("n", "a", "junk")
    val out = Align.alignToMeta(df, meta, dropColumns = Seq("part_col"))
    assert(out.columns.toSeq == Seq("a", "n"))
    assert(out.schema("n").dataType == IntegerType) // long -> declared int downcast
    assert(out.collect().toSeq == Seq(Row("x", 5), Row("y", 7)))
  }

  test("missing declared column becomes a typed null (schema drift firewall)") {
    val df = Seq(("x", 1)).toDF("a", "n")
    val out = Align.alignToMeta(df, meta)
    assert(out.columns.toSeq == Seq("a", "n", "part_col"))
    assert(out.schema("part_col").dataType == DateType)
    assert(out.collect().head.isNullAt(2))
  }

  test("unparseable cast yields null, not an ANSI error (legacy try_cast semantics)") {
    val df = Seq(("x", "not-a-number")).toDF("a", "n")
    val out = Align.alignToMeta(df, meta, dropColumns = Seq("part_col"))
    assert(out.collect().head.isNullAt(1))
  }

  test("addMissingAsNull=false fails fast on drift") {
    val df = Seq(Tuple1("x")).toDF("a")
    assertThrows[IllegalArgumentException](
      Align.alignToMeta(df, meta, addMissingAsNull = false))
  }
}
