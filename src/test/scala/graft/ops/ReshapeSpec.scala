package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class ReshapeSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.session

  test("flattenOneLevel lifts result.* and prefixes nested codes_* (reference O2)") {
    // the postcodes.io response shape: {status, result: {postcode, codes: {...}}}
    val json = Seq(
      """{"status": 200, "result": {"postcode": "SN9 6DZ", "quality": 1,
        |  "codes": {"admin_district": "E06000054", "ccg": "E38000206"}}}""".stripMargin
        .replace("\n", ""))
    import spark.implicits._
    val raw = spark.read.json(spark.createDataset(json))
    val flat = Reshape.flattenOneLevel(raw, "result")
    assert(flat.columns.toSet ==
      Set("status", "postcode", "quality", "codes_admin_district", "codes_ccg"))
    val r = flat.select("postcode", "codes_admin_district").collect().head
    assert(r.getString(0) == "SN9 6DZ" && r.getString(1) == "E06000054")
  }

  test("withRowIndex yields a contiguous 0..n-1 index in the given order (reference O3)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq("c", "a", "b").toDF("v").repartition(3)
    val indexed = Reshape.withRowIndex(df, "index", Seq(col("v")))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(indexed.sortBy(_._2).toSeq == Seq(("a", 0L), ("b", 1L), ("c", 2L)))
  }
}
