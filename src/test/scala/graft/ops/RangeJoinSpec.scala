package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.session
  import spark.implicits._

  val points = Seq((1L, 5L), (2L, 95L), (3L, 180L), (4L, -10L)).toDF("pid", "x")
  val intervals = Seq((10L, 0L, 100L), (20L, 90L, 200L), (30L, -50L, -1L))
    .toDF("iid", "lo", "hi")

  test("binned range join equals the naive theta join, including negative axes") {
    val binned = RangeJoin.binnedRangeJoin(points, intervals, "x", "lo", "hi", 64L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(intervals, col("x").between(col("lo"), col("hi")))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned == naive)
    assert(binned == Set((1L, 10L), (2L, 10L), (2L, 20L), (3L, 20L), (4L, 30L)))
  }

  test("binned rewrite plans a shuffled equi-join, not a nested loop") {
    val plan = RangeJoin.binnedRangeJoin(points, intervals, "x", "lo", "hi", 64L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("__bin"), plan)
  }

  test("no duplicate pairs: each point maps to exactly one bin") {
    val out = RangeJoin.binnedRangeJoin(points, intervals, "x", "lo", "hi", 7L)
      .groupBy("pid", "iid").count().filter(col("count") > 1).count()
    assert(out == 0)
  }

  test("interval join: seeded random intervals ≡ naive overlap join, once each, any bin width") {
    // seeded LCG, negative axis included, long spans crossing many bins
    val rnd = new scala.util.Random(7)
    val rows = (1 to 300).map { i =>
      val lo = rnd.nextInt(400) - 200L
      (i.toLong, i % 3L, lo, lo + rnd.nextInt(60))
    }
    val a = rows.toDF("a_id", "g", "a_lo", "a_hi")
    val b = rows.map { case (id, g, lo, hi) => (id, g, lo, hi) }
      .toDF("b_id", "g", "b_lo", "b_hi")
    val naive = a.join(b, Seq("g"))
      .filter(col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (w <- Seq(1L, 7L, 64L, 1000L)) {
      val got = RangeJoin.binnedIntervalJoin(a, b, Seq("g"),
          "a_lo", "a_hi", "b_lo", "b_hi", w)
        .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == got.toSet.size, s"duplicates at binWidth=$w")
      assert(got.toSet == naive, s"mismatch at binWidth=$w")
    }
  }

  test("interval join plans a shuffled equi-join on (keys, bin)") {
    val a = Seq((1L, 0L, 0L, 10L)).toDF("a_id", "g", "a_lo", "a_hi")
    val b = Seq((2L, 0L, 5L, 15L)).toDF("b_id", "g", "b_lo", "b_hi")
    val plan = RangeJoin.binnedIntervalJoin(a, b, Seq("g"),
      "a_lo", "a_hi", "b_lo", "b_hi", 8L).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("__bin"), plan)
  }
}
