package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class CountMinSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.session
  import spark.implicits._

  private val items = (1 to 400).flatMap(i => Seq.fill(i % 7 + 1)(s"item_$i"))
  private lazy val df = items.toDF("item")
  private lazy val exact = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("estimates are one-sided: always >= the true count") {
    val state = CountMin.buildState(df, "item")
    val probes = exact.keys.toSeq.toDF("item")
    val est = CountMin.estimate(state, probes, "item")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, c) => assert(est(k) >= c, s"$k underestimated") }
  }

  test("with a wide sketch (no collisions) estimates are exact") {
    val state = CountMin.buildState(df, "item", depth = 4, width = 1 << 20)
    val probes = exact.keys.toSeq.toDF("item")
    val est = CountMin.estimate(state, probes, "item", depth = 4, width = 1 << 20)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == exact)
  }

  test("never-seen items estimate 0 (or a collision's count, never negative)") {
    val state = CountMin.buildState(df, "item", depth = 4, width = 1 << 20)
    val est = CountMin.estimate(state, Seq("ghost").toDF("item"), "item",
      depth = 4, width = 1 << 20).collect().head.getLong(1)
    assert(est == 0L)
  }

  test("split build + merge equals the one-pass state, counter for counter") {
    val (h1, h2) = items.splitAt(items.length / 3)
    val merged = CountMin.merge(
      CountMin.buildState(h1.toDF("item"), "item"),
      CountMin.buildState(h2.toDF("item"), "item"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val full = CountMin.buildState(df, "item")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == full)
  }
}
