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
}
