package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class ObservabilitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.session
  import spark.implicits._

  // listener delivery is async on the (private) listener bus — poll
  private def awaitRecords(rec: RunRecorder, atLeast: Int, timeoutMs: Long = 10000): Seq[ActionRecord] = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (rec.snapshot().size < atLeast && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    rec.snapshot()
  }

  test("recorder captures completed actions with plan-metric row counts") {
    val rec = Observability.attach(spark)
    try {
      Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "s")
        .filter($"id" > 1).collect()
      val recs = awaitRecords(rec, 1)
      assert(recs.nonEmpty)
      val last = recs.last
      assert(last.error.isEmpty)
      assert(last.durationNs > 0)
      assert(last.outputRows.contains(2L), recs.mkString("\n"))
    } finally Observability.detach(spark, rec)
  }

  test("row counts survive AQE + whole-stage codegen (parquet aggregate)") {
    val aqeKey = "spark.sql.adaptive.enabled"
    val saved = spark.conf.getOption(aqeKey)
    spark.conf.set(aqeKey, "true")
    val rec = Observability.attach(spark)
    try {
      val n = spark.read.parquet(s"${graft.SparkTestBase.sf0001}/nation.parquet")
        .filter($"n_regionkey" =!= 99).groupBy("n_regionkey").count().collect().length
      val recs = awaitRecords(rec, 1)
      val last = recs.last
      assert(last.error.isEmpty)
      assert(last.outputRows.contains(n.toLong),
        s"expected Some($n), got ${last.outputRows} — AQE/codegen root metric lookup broken")
    } finally {
      Observability.detach(spark, rec)
      saved match {
        case Some(v) => spark.conf.set(aqeKey, v)
        case None => spark.conf.unset(aqeKey)
      }
    }
  }

  test("recorder is detachable and clearable") {
    val rec = Observability.attach(spark)
    Seq(1).toDF("x").collect()
    assert(awaitRecords(rec, 1).nonEmpty)
    rec.clear()
    assert(rec.snapshot().isEmpty)
    Observability.detach(spark, rec)
    Seq(2).toDF("x").collect()
    Thread.sleep(500)
    assert(rec.snapshot().isEmpty) // no longer receiving
  }
}
