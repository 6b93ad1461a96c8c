package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SkylineSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.session
  import spark.implicits._

  private def naive(rows: Seq[(Long, Double, Int)]): Seq[(Long, Double, Int)] =
    rows.filterNot { case (_, p, s) =>
      rows.exists { case (_, p2, s2) =>
        p2 <= p && s2 >= s && (p2 < p || s2 > s)
      }
    }

  test("staircase skyline equals the quadratic dominance filter on seeded random data") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 300L).map(i =>
      (i, (rnd.nextInt(500) / 10.0), rnd.nextInt(40)))
    val df = rows.toDF("id", "price", "size")
    val got = Skyline.skyline2d(df, "price", "size")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    assert(got.toSeq == naive(rows).sortBy(_._1))
  }

  test("duplicate frontier points all survive; dominated ties die") {
    val df = Seq(
      (1L, 1.0, 10), (2L, 1.0, 10), // identical frontier twins
      (3L, 1.0, 9),                 // same price, strictly smaller -> dominated
      (4L, 2.0, 10),                // same size, strictly pricier -> dominated
      (5L, 2.0, 11)                 // frontier: bigger, pricier
    ).toDF("id", "price", "size")
    val ids = Skyline.skyline2d(df, "price", "size")
      .select("id").orderBy("id").as[Long].collect().toSeq
    assert(ids == Seq(1L, 2L, 5L))
  }

  test("null dimensions are excluded, not comparable") {
    val df = Seq[(java.lang.Long, java.lang.Double, java.lang.Integer)](
      (1L, 1.0, 10), (2L, null, 99), (3L, 0.5, null)
    ).toDF("id", "price", "size")
    val ids = Skyline.skyline2d(df, "price", "size")
      .select("id").as[Long].collect().toSeq
    assert(ids == Seq(1L))
  }
}
