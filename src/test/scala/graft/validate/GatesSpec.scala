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

  test("value gates: nullable / enum / regex accumulate EVERY violation in one pass") {
    val spark = graft.SparkTestBase.session
    import spark.implicits._
    val vmeta = TableMeta("t", "json", Seq(
      ColumnMeta("code", "character", nullable = false,
        pattern = Some("[A-Z]{2}[0-9]+")),
      ColumnMeta("country", "character",
        enumValues = Seq("England", "Wales", "Scotland")),
      ColumnMeta("quality", "int", enumValues = (1 to 9).map(_.toString))))
    val good = Seq(
      ("AB1", "England", 1), ("CD22", "Wales", 9), ("EF3", "Scotland", 5))
      .toDF("code", "country", "quality")
    val g = Gates.valueGates(good, vmeta)
    assert(g.passed && g.errors.isEmpty)
    // every violation class at once: a NULL in a not-null column, a
    // pattern miss (anchored FULL match: 'AB1x' fails), two enum
    // misses in country, one out-of-range quality
    val bad = Seq(
      (null.asInstanceOf[String], "England", 1),
      ("AB1x", "France", 3),
      ("ZZ9", "Mars", 11))
      .toDF("code", "country", "quality")
    val r = Gates.valueGates(bad, vmeta)
    assert(!r.passed)
    assert(r.errors.size == 4, r.errors.mkString("; "))
    assert(r.errors.exists(_.contains("code: 1 null")))
    assert(r.errors.exists(e => e.contains("code") && e.contains("pattern")))
    assert(r.errors.exists(e => e.contains("country: 2 values outside enum")))
    assert(r.errors.exists(e => e.contains("quality: 1 values outside enum")))
    // a NULL in a nullable enum column is NOT an enum violation
    val nulls = Seq(("AB1", null.asInstanceOf[String], 1))
      .toDF("code", "country", "quality")
    assert(Gates.valueGates(nulls, vmeta).passed)
    // no declared constraints → trivially green, zero jobs
    assert(Gates.valueGates(good, meta.copy(columns = Seq(
      ColumnMeta("code", "character")))).passed)
  }

  test("metadata gatedWrite: value gates ride the write's observe; failures abort the promote") {
    val spark = graft.SparkTestBase.session
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("gates-meta").toString
    val vmeta = TableMeta("t", "parquet", Seq(
      ColumnMeta("code", "character", nullable = false),
      ColumnMeta("quality", "int", enumValues = Seq("1", "2", "3"))))
    val good = Seq(("A", 1), ("B", 2), ("C", 3)).toDF("code", "quality")
    assert(Gates.gatedWrite(good, s"$dir/ok", minRows = 3, meta = vmeta).passed)
    assert(spark.read.parquet(s"$dir/ok").count() == 3)
    // row-count + null + enum failures all reported in ONE exception,
    // and the failed batch never lands
    val bad = Seq((null.asInstanceOf[String], 9), ("B", 2))
      .toDF("code", "quality")
    val e = intercept[Gates.GateFailure] {
      Gates.gatedWrite(bad, s"$dir/ok", minRows = 3, meta = vmeta)
    }
    assert(e.result.errors.size == 3, e.result.errors.mkString("; "))
    assert(e.result.errors.exists(_.contains("row count 2")))
    assert(e.result.errors.exists(_.contains("code: 1 null")))
    assert(e.result.errors.exists(_.contains("quality: 1 values outside enum")))
    assert(spark.read.parquet(s"$dir/ok").count() == 3,
      "a failing batch must leave the previous good output untouched")
    // a column-set mismatch refuses before any write job runs
    val wrong = Seq((1, 2)).toDF("x", "quality")
    val e2 = intercept[Gates.GateFailure] {
      Gates.gatedWrite(wrong, s"$dir/ok", minRows = 1, meta = vmeta)
    }
    assert(e2.result.errors.exists(_.contains("missing declared column: code")))
  }

  test("metadata round-trip: nullable/enum/pattern parse and render back") {
    val json =
      """{
        |  "name": "pc", "data_format": "json",
        |  "columns": [
        |    {"name": "postcode", "type": "character",
        |     "nullable": false, "pattern": "[A-Z0-9 ]+"},
        |    {"name": "country", "type": "character",
        |     "enum": ["England", "Wales"]},
        |    {"name": "quality", "type": "int"}
        |  ]
        |}""".stripMargin
    val m = graft.meta.Meta.parseTable(json)
    assert(!m.columns(0).nullable &&
      m.columns(0).pattern.contains("[A-Z0-9 ]+"))
    assert(m.columns(1).enumValues == Seq("England", "Wales"))
    assert(m.columns(2).nullable && m.columns(2).enumValues.isEmpty &&
      m.columns(2).pattern.isEmpty)
    val again = graft.meta.Meta.parseTable(graft.meta.Meta.renderTable(m))
    assert(again.columns == m.columns)
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
