package graft.validate

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class ConstraintsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.session
  import spark.implicits._

  private def one(df: org.apache.spark.sql.DataFrame): Long =
    df.head().getLong(1)

  private lazy val t = Seq(
    (1L, "OK", "AB-123"),
    (2L, "OK", "XY-999"),
    (3L, "BAD", "nope"),
    (4L, null.asInstanceOf[String], "CD-000"))
    .toDF("id", "status", "code")

  test("inEnum counts values outside the allowed set, nulls pass") {
    assert(one(Constraints.inEnum(t, "r", "status", Seq("OK"))) === 1L)
    assert(one(Constraints.inEnum(t, "r", "status", Seq("OK", "BAD"))) === 0L)
  }

  test("matchesRegex anchors the pattern and counts non-matches, nulls pass") {
    assert(one(Constraints.matchesRegex(t, "r", "code", "[A-Z]{2}-[0-9]{3}")) === 1L)
    // anchored: a pattern matching only a SUBSTRING must still violate
    assert(one(Constraints.matchesRegex(t, "r", "code", "[A-Z]{2}")) === 4L)
  }

  test("checkAll unions rules into the deterministic violations table") {
    val out = Constraints.checkAll(Seq(
      Constraints.notNull(t, "status_not_null", "status"),
      Constraints.inEnum(t, "status_enum", "status", Seq("OK")),
      Constraints.uniqueKey(t, "id_unique", Seq("id")))).collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq === Seq(
      ("id_unique", 0L), ("status_enum", 1L), ("status_not_null", 1L)))
  }
}
