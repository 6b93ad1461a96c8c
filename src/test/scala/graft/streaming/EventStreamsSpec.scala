package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class EventStreamsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.session

  test("streaming hourly counts equal the batch twin on the events fixture") {
    val q = EventStreams.hourlyCountsStream(spark, SparkTestBase.sf0001, "ev_counts_test")
    try q.awaitTermination(120000) finally q.stop()
    val streamed = spark.sql(
      "SELECT win_start, event_type, n, sum_value FROM ev_counts_test ORDER BY win_start, event_type")
      .collect()
    val batch = EventStreams.hourlyCountsBatch(spark, SparkTestBase.sf0001).collect()
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (s, b) => assert(s == b) }
  }
}
