package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row

import graft.SparkTestBase

class TimeOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.session
  import spark.implicits._

  test("asofJoinBackward attaches the most recent right row at or before each left ts") {
    val left = Seq((1L, 100L, "p1"), (1L, 250L, "p2"), (2L, 50L, "p3"))
      .toDF("user", "lts", "tag")
    val right = Seq((1L, 100L, "c1"), (1L, 200L, "c2"), (1L, 300L, "c3"), (3L, 10L, "c4"))
      .toDF("user", "rts", "click")
    val out = TimeOps.asofJoinBackward(left, right, "user", "lts", "rts", Seq("click"))
      .orderBy("user", "lts").collect()
    assert(out.toSeq == Seq(
      Row(1L, 100L, "p1", "c1"),   // equality matches (>= semantics)
      Row(1L, 250L, "p2", "c2"),   // most recent <= 250 is 200
      Row(2L, 50L, "p3", null)))   // no right rows for key 2 -> null
  }

  test("asofJoinForward attaches the nearest right row at or after each left ts") {
    val left = Seq((1L, 100L, "p1"), (1L, 250L, "p2"), (2L, 50L, "p3"))
      .toDF("user", "lts", "tag")
    val right = Seq((1L, 100L, "c1"), (1L, 200L, "c2"), (1L, 300L, "c3"), (3L, 10L, "c4"))
      .toDF("user", "rts", "click")
    val out = TimeOps.asofJoinForward(left, right, "user", "lts", "rts", Seq("click"))
      .orderBy("user", "lts").collect()
    assert(out.toSeq == Seq(
      Row(1L, 100L, "p1", "c1"),   // equality matches (<= semantics)
      Row(1L, 250L, "p2", "c3"),   // nearest >= 250 is 300
      Row(2L, 50L, "p3", null)))   // no right rows for key 2 -> null
  }

  test("as-of joins never match NULL keys to NULL keys (ASOF equi-join semantics)") {
    val left = Seq((Option.empty[Long], 100L, "p1"), (Some(1L), 100L, "p2"))
      .toDF("user", "lts", "tag")
    val right = Seq((Option.empty[Long], 50L, "cNull"), (Some(1L), 50L, "c1"))
      .toDF("user", "rts", "click")
    val back = TimeOps.asofJoinBackward(left, right, "user", "lts", "rts", Seq("click"))
      .orderBy("tag").collect()
    assert(back(0).isNullAt(3))          // null-key left row: no match
    assert(back(1).getString(3) == "c1") // real key matches normally
    val fwd = TimeOps.asofJoinForward(left, right, "user", "lts", "rts", Seq("click"))
      .orderBy("tag").collect()
    assert(fwd(0).isNullAt(3))
  }

  test("sessionize splits on gaps greater than gapNanos") {
    val ev = Seq(
      (1L, 0L), (1L, 10L), (1L, 1000L),  // gap 990 > 100 -> new session
      (2L, 5L))
      .toDF("user", "tsn")
    val out = TimeOps.sessionize(ev, "user", "tsn", gap = 100L)
      .orderBy("user", "session_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, 1L, 2L, 0L, 10L),
      (1L, 2L, 1L, 1000L, 1000L),
      (2L, 1L, 1L, 5L, 5L)))
  }

  test("streaming sessionizer matches the batch operator on the events fixture") {
    val q = graft.streaming.EventStreams.sessionizeStream(
      spark, SparkTestBase.sf0001, "sess_test")
    try q.awaitTermination(120000) finally q.stop()
    val streamed = spark.sql(
      """SELECT user_id, session_id, n_events, start_ts, end_ts
        |FROM sess_test ORDER BY user_id, session_id""".stripMargin).collect()
    val batch = TimeOps.sessionize(
      graft.queries.QueryUtil.events(spark, SparkTestBase.sf0001)
        .select("user_id", "ts"), "user_id", "ts",
      gap = 30L * 60 * 1000 * 1000 * 1000)
      .orderBy("user_id", "session_id").collect()
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (s, b) => assert(s == b) }
  }
}
