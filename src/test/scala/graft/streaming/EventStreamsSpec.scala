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

  test("streaming sliding-window counts equal the batch twin on the events fixture") {
    val q = EventStreams.slidingCountsStream(spark, SparkTestBase.sf0001, "ev_sliding_test")
    try q.awaitTermination(120000) finally q.stop()
    val streamed = spark.sql(
      "SELECT win_us, event_type, n, sum_value FROM ev_sliding_test ORDER BY win_us, event_type")
      .collect()
    val batch = EventStreams.slidingCountsBatch(spark, SparkTestBase.sf0001).collect()
    assert(streamed.length == batch.length)
    assert(batch.length > 4) // overlapping windows actually materialized
    streamed.zip(batch).foreach { case (s, b) => assert(s == b) }
  }

  test("stream-stream interval join equals the batch join on the events fixture") {
    val q = EventStreams.purchaseClickJoinStream(spark, SparkTestBase.sf0001, "ev_ssjoin_test")
    try q.awaitTermination(120000) finally q.stop()
    val streamed = spark.sql("SELECT user_id, pts_us, cts_us FROM ev_ssjoin_test")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = EventStreams.purchaseClickJoinBatch(spark, SparkTestBase.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("transformWithState running spend equals the batch cumulative window") {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    val q = EventStreams.runningSpendStream(spark, SparkTestBase.sf0001, "ev_tws_test")
    try q.awaitTermination(120000) finally {
      q.stop()
      // un-pin the suite's shared session from RocksDB for later suites
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
    val streamed = spark.sql(
      "SELECT user_id, ts, event_id, n_events, cum_cents FROM ev_tws_test " +
        "ORDER BY user_id, ts, event_id")
      .collect().map(_.toSeq).toSeq
    val batch = EventStreams.runningSpendBatch(spark, SparkTestBase.sf0001)
      .orderBy("user_id", "ts", "event_id")
      .collect().map(_.toSeq).toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("streaming as-of enrichment equals the batch backward as-of join") {
    import org.apache.spark.sql.functions._
    val q = EventStreams.asofEnrichStream(spark, SparkTestBase.sf0001, "ev_asof_test")
    try q.awaitTermination(120000) finally q.stop()
    val streamed = spark.sql(
      "SELECT event_id, user_id, pts, click_id, click_ts FROM ev_asof_test ORDER BY event_id")
      .collect().map(_.toSeq).toSeq

    val ev = graft.queries.QueryUtil.events(spark, SparkTestBase.sf0001)
      .withColumn("ts_us", expr("ts DIV 1000"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us").as("pts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us").as("cts"),
        col("event_id").as("click_id"), col("ts_us").as("click_ts"))
    val batch = graft.ops.TimeOps.asofJoinBackward(purchases, clicks,
      "user_id", "pts", "cts", Seq("click_id", "click_ts"))
      .orderBy("event_id").collect().map(_.toSeq).toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("streaming watermarked dedup: same key set as batch distinct, bounded re-emission") {
    val q = EventStreams.distinctKeysStream(spark, SparkTestBase.sf0001, "ev_dedup_test")
    try q.awaitTermination(120000) finally q.stop()
    val rows = spark.sql("SELECT user_id, event_type FROM ev_dedup_test")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val batch = spark.read.parquet(s"${SparkTestBase.sf0001}/events.parquet")
      .select("user_id", "event_type").distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // key SET equality is the contract; multiplicity may exceed 1 when a
    // key recurs beyond the watermark (state evicted) but never reaches
    // the raw event count (within-gap duplicates are dropped)
    assert(rows.toSet == batch)
    assert(rows.length >= batch.size)
    val raw = spark.read.parquet(s"${SparkTestBase.sf0001}/events.parquet").count()
    assert(rows.length < raw)
  }
  test("streaming daily-count state serves decayed counters equal to the batch query") {
    val q = EventStreams.dailyCountsStream(spark, SparkTestBase.sf0001, "ev_decay_test")
    try q.awaitTermination(120000) finally q.stop()
    val served = EventStreams.decayedFromDaily(spark.table("ev_decay_test"))
      .collect().map(_.toSeq).toSeq
    val batch = graft.SparkEntry.queries("q_decayed_counts")(spark, SparkTestBase.sf0001)
      .collect().map(_.toSeq).toSeq
    assert(served.nonEmpty)
    assert(served == batch)
  }

}
