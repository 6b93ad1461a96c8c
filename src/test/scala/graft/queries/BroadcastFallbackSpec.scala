package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestBase}

/** The "benchmark-sized" anti joins (q_decontaminate_apply,
  * q_dedup_apply) must broadcast their flagged/loser set when it is
  * actually small — and DEGRADE to a shuffled join, same results, when
  * the threshold says no. Neither query hint-forces the broadcast: a
  * forced hint would OOM the driver the day the flagged set stops being
  * benchmark-sized, so the conversion is AQE's runtime decision from the
  * build side's measured size. */
class BroadcastFallbackSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.session
  private val sf = SparkTestBase.sf0001

  /** Final ADAPTIVE plan string — collect() first so AQE has re-planned
    * every stage with runtime sizes. */
  private def finalPlan(name: String): (String, Seq[String]) = {
    val df = SparkEntry.queries(name)(spark, sf)
    val rows = df.collect().map(_.toString).toSeq
    (df.queryExecution.executedPlan.toString, rows)
  }

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  for (q <- Seq("q_decontaminate_apply", "q_dedup_apply")) {
    test(s"$q: AQE broadcasts the small flagged set; threshold off -> shuffled join, same rows") {
      val (broadcastPlan, broadcastRows) = withConf(
        "spark.sql.adaptive.enabled" -> "true") {
        finalPlan(q)
      }
      assert(broadcastPlan.contains("BroadcastHashJoin") &&
        broadcastPlan.contains("LeftAnti"),
        s"expected a runtime broadcast anti join:\n$broadcastPlan")

      val (fallbackPlan, fallbackRows) = withConf(
        "spark.sql.adaptive.enabled" -> "true",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
        finalPlan(q)
      }
      assert(
        fallbackPlan.contains("SortMergeJoin") ||
          fallbackPlan.contains("ShuffledHashJoin"),
        s"expected a shuffled-join fallback:\n$fallbackPlan")
      assert(!fallbackPlan.contains("BroadcastHashJoin"),
        s"threshold -1 must disable every broadcast:\n$fallbackPlan")

      assert(fallbackRows === broadcastRows,
        s"$q rows diverged between broadcast and fallback plans")
    }
  }
}
