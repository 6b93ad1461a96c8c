package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class IncrementalAggSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.session
  import spark.implicits._

  private val data = Seq(
    ("a", 1.5), ("a", 2.5), ("a", -1.0),
    ("b", 10.0), ("b", 0.25),
    ("c", 7.0)).toDF("k", "v")

  test("refresh over any split equals the from-scratch rollup") {
    val full = IncrementalAgg.serve(
      IncrementalAgg.buildState(data, Seq("k"), "v"), Seq("k"))

    // three different splits, including an empty delta
    val splits = Seq(
      (data.filter(col("v") > 1.0), data.filter(col("v") <= 1.0)),
      (data.limit(0), data),
      (data.filter(col("k") === "a"), data.filter(col("k") =!= "a")))
    splits.foreach { case (hist, delta) =>
      val refreshed = IncrementalAgg.serve(
        IncrementalAgg.refresh(
          IncrementalAgg.buildState(hist, Seq("k"), "v"),
          delta, Seq("k"), "v"),
        Seq("k"))
      assert(refreshed.exceptAll(full).count() === 0)
      assert(full.exceptAll(refreshed).count() === 0)
    }
  }

  test("repeated small refreshes accumulate exactly (associativity chain)") {
    val batches = data.randomSplit(Array(1, 1, 1, 1), seed = 7)
    val init = IncrementalAgg.buildState(batches.head, Seq("k"), "v")
    val folded = batches.tail.foldLeft(init)(
      (st, b) => IncrementalAgg.refresh(st, b, Seq("k"), "v"))
    val full = IncrementalAgg.serve(
      IncrementalAgg.buildState(data, Seq("k"), "v"), Seq("k"))
    val got = IncrementalAgg.serve(folded, Seq("k"))
    assert(got.exceptAll(full).count() === 0 && full.exceptAll(got).count() === 0)
  }
}
