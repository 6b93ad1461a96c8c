package graft.validate

import org.scalatest.funsuite.AnyFunSuite

import graft.meta.{ColumnMeta, TableMeta}

class GatesSpec extends AnyFunSuite {

  val meta = TableMeta("t", "json", Seq(
    ColumnMeta("a", "character"), ColumnMeta("b", "int"), ColumnMeta("c", "double")))

  test("row-count gate: >= min passes, < min fails (reference test_data.py:33-39)") {
    assert(Gates.rowCountGate(100L, 100L).passed)
    val r = Gates.rowCountGate(99L, 100L)
    assert(!r.passed && r.errors.head.contains("99"))
  }

  test("column-set gate reports the full symmetric difference (test_data.py:41-54)") {
    val r = Gates.columnSetGate(Seq("a", "b", "extra1", "extra2"), meta)
    assert(!r.passed)
    assert(r.errors.exists(_.contains("missing declared column: c")))
    assert(r.errors.exists(_.contains("unexpected column not in metadata: extra1")))
    assert(r.errors.exists(_.contains("unexpected column not in metadata: extra2")))
    assert(r.errors.size == 3) // ALL failures accumulated, not just the first
  }

  test("ignore set excludes partition-discovery columns") {
    assert(Gates.columnSetGate(Seq("a", "b", "c", "file_land_timestamp"), meta,
      ignore = Set("file_land_timestamp")).passed)
  }

  test("enforce accumulates across gates then throws once") {
    val e = intercept[Gates.GateFailure] {
      Gates.enforce(
        Gates.rowCountGate(5L, 100L),
        Gates.columnSetGate(Seq("a", "b"), meta))
    }
    assert(e.result.errors.size == 2) // both gates' errors in one failure
  }

  test("gatedWrite validates in the write pass: pass keeps output, fail deletes it") {
    val spark = graft.SparkTestBase.session
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("gated").toString

    // passing write: metrics come from the write job itself (no second scan)
    val ok = Seq((1L, Some("a")), (2L, Some("b")), (3L, Some("c")))
      .toDF("id", "v")
    val r = Gates.gatedWrite(ok, s"$dir/ok", minRows = 3, notNullCols = Seq("v"))
    assert(r.passed)
    assert(spark.read.parquet(s"$dir/ok").count() == 3)

    // failing write: BOTH violations accumulate, nothing lands
    val bad = Seq((1L, Some("a")), (2L, None)).toDF("id", "v")
    val e = intercept[Gates.GateFailure] {
      Gates.gatedWrite(bad, s"$dir/bad", minRows = 3, notNullCols = Seq("v"))
    }
    assert(e.result.errors.size == 2)
    assert(e.result.errors.exists(_.contains("row count 2")))
    assert(e.result.errors.exists(_.contains("column v: 1 null")))
    assert(!new java.io.File(s"$dir/bad").exists())
    assert(!new java.io.File(s"$dir/bad.__inflight").exists())

    // a failing re-run must leave the PREVIOUS good output untouched
    intercept[Gates.GateFailure] {
      Gates.gatedWrite(bad, s"$dir/ok", minRows = 3, notNullCols = Seq("v"))
    }
    assert(spark.read.parquet(s"$dir/ok").count() == 3)
  }

  test("profile counts nulls and distincts per column, normalizes extremes") {
    val spark = graft.SparkTestBase.session
    import spark.implicits._
    val df = Seq(
      (Some(1.0), Some("x")), (Some(2.5), None),
      (None, Some("x")), (Some(2.5), Some("y"))).toDF("num", "s")
    val got = DataProfile.profile(df, Seq(
      "num" -> ((c: org.apache.spark.sql.Column) => c.cast("decimal(18,2)")),
      "s" -> identity[org.apache.spark.sql.Column] _))
      .orderBy("column")
      .as[(String, Long, Long, Long, Option[String], Option[String])].collect()
    assert(got === Array(
      ("num", 3L, 1L, 2L, Some("1.00"), Some("2.50")),
      ("s", 3L, 1L, 2L, Some("x"), Some("y"))))
  }
}
