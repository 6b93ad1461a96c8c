package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TopKSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.session
  import spark.implicits._

  val df = Seq(
    ("a", 1L, 5.0), ("a", 2L, 9.0), ("a", 3L, 9.0), ("a", 4L, 1.0),
    ("b", 5L, 2.0), ("b", 6L, 2.0))
    .toDF("g", "id", "v")

  test("heap top-k equals the window formulation, deterministic on ties") {
    val heap = TopK.topKPerGroup(df, Seq("g"), "id", "v", 2)
      .select("g", "rank", "id", "v").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
    val window = df.withColumn("rank", row_number().over(w)).filter(col("rank") <= 2)
      .select("g", "rank", "id", "v").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(heap == window)
    assert(heap == Set(("a", 1, 2L, 9.0), ("a", 2, 3L, 9.0), ("b", 1, 5L, 2.0), ("b", 2, 6L, 2.0)))
  }

  test("k larger than the group returns the whole group, ranked") {
    val out = TopK.topKPerGroup(df.filter(col("g") === "b"), Seq("g"), "id", "v", 10)
    assert(out.count() == 2)
  }

  test("IEEE specials rank like Spark's ORDER BY: NaN greatest, -0.0 below 0.0") {
    val special = Seq(
      ("s", 1L, Double.NaN), ("s", 2L, Double.PositiveInfinity),
      ("s", 3L, 0.0), ("s", 4L, -0.0))
      .toDF("g", "id", "v")
    val heap = TopK.topKPerGroup(special, Seq("g"), "id", "v", 4)
      .orderBy("rank").collect().map(_.getLong(2)).toSeq
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
    val window = special.withColumn("rank", row_number().over(w))
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(heap == window)
    assert(heap == Seq(1L, 2L, 3L, 4L)) // NaN, +Inf, 0.0, -0.0
  }
}
