package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ops.TimeOps

class AsofJoinNativeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.session
  import spark.implicits._

  private def collectPairs(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("id").collect().map { r =>
      (r.getLong(0),
        if (r.isNullAt(r.fieldIndex("v1"))) null else r.getString(r.fieldIndex("v1")),
        if (r.isNullAt(r.fieldIndex("v2"))) null else java.lang.Long.valueOf(r.getLong(r.fieldIndex("v2"))))
    }.toSeq

  test("native exec matches the composed union+window operator on seeded random data") {
    val rnd = new scala.util.Random(11)
    val left = (1 to 500).map(i =>
      (i.toLong, (rnd.nextInt(20) + 1).toLong, rnd.nextInt(100).toLong))
      .toDF("id", "k", "lts")
    val right = (1 to 500).map { i =>
      val k = (rnd.nextInt(20) + 1).toLong
      val ts = rnd.nextInt(100).toLong
      (k, ts, s"p$i", i.toLong)
    }.toDF("k", "rts", "v1", "v2")

    val native = AsofJoinNative.join(left, right, "k", "lts", "rts", Seq("v1", "v2"))
    val composed = TimeOps.asofJoinBackward(left, right, "k", "lts", "rts", Seq("v1", "v2"))
    assert(collectPairs(native) === collectPairs(composed))
    assert(native.columns.toSeq === Seq("id", "k", "lts", "v1", "v2"))
  }

  test("SQL null semantics: null keys and null timestamps match nothing") {
    val left = Seq(
      (1L, java.lang.Long.valueOf(1L), java.lang.Long.valueOf(50L)),
      (2L, null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(50L)),
      (3L, java.lang.Long.valueOf(1L), null.asInstanceOf[java.lang.Long]))
      .toDF("id", "k", "lts")
    val right = Seq(
      (java.lang.Long.valueOf(1L), java.lang.Long.valueOf(10L), "a", 1L),
      (null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(5L), "nullkey", 2L),
      (java.lang.Long.valueOf(1L), null.asInstanceOf[java.lang.Long], "nullts", 3L))
      .toDF("k", "rts", "v1", "v2")
    val got = collectPairs(
      AsofJoinNative.join(left, right, "k", "lts", "rts", Seq("v1", "v2")))
    assert(got === Seq(
      (1L, "a", java.lang.Long.valueOf(1L)), // only the non-null right row
      (2L, null, null),                      // null left key
      (3L, null, null)))                     // null left ts
  }

  test("ties on (key, ts): the greatest payload wins, equality matches (>=)") {
    val left = Seq((1L, 7L, 10L)).toDF("id", "k", "lts")
    val right = Seq(
      (7L, 10L, "x", 1L), (7L, 10L, "z", 9L), (7L, 10L, "y", 5L))
      .toDF("k", "rts", "v1", "v2")
    val got = collectPairs(
      AsofJoinNative.join(left, right, "k", "lts", "rts", Seq("v1", "v2")))
    assert(got === Seq((1L, "z", java.lang.Long.valueOf(9L))))
  }

  test("generic path: string keys take the interpreted-ordering merge") {
    val left = Seq((1L, "alice", 10L), (2L, "bob", 10L), (3L, "carol", 10L))
      .toDF("id", "k", "lts")
    val right = Seq(("alice", 5L, "a1", 1L), ("alice", 9L, "a2", 2L),
      ("bob", 11L, "late", 3L)).toDF("k", "rts", "v1", "v2")
    val got = collectPairs(
      AsofJoinNative.join(left, right, "k", "lts", "rts", Seq("v1", "v2")))
    assert(got === Seq(
      (1L, "a2", java.lang.Long.valueOf(2L)),
      (2L, null, null),   // only a later click exists
      (3L, null, null)))  // key absent from right
  }

  test("plans AsofJoinExec with planner-inserted exchanges and sorts") {
    val left = (1 to 50).map(i => (i.toLong, i % 5L, i.toLong)).toDF("id", "k", "lts")
      .repartition(7)
    val right = (1 to 50).map(i => (i % 5L, i.toLong, s"p$i", i.toLong))
      .toDF("k", "rts", "v1", "v2").repartition(3)
    val df = AsofJoinNative.join(left, right, "k", "lts", "rts", Seq("v1", "v2"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan)
    assert(plan.contains("hashpartitioning"), plan)
    assert(plan.contains("Sort"), plan)
    // and it actually runs under those exchanges
    assert(df.count() === 50)
  }
}
