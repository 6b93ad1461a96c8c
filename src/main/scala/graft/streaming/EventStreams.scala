package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, StreamingQuery, TimeMode, TimerValues, Trigger, TTLConfig, ValueState}
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/**
 * Structured Streaming over the events table (SURVEY.md §2.2: the
 * reference is batch-only — its streaming analog is the cron micro-batch
 * cadence landing `file_land_timestamp` partitions; here that maps to a
 * file-source stream with `Trigger.AvailableNow`, tumbling-window
 * aggregation and a watermark for late data).
 */
object EventStreams {

  /** Tumbling-window counts as a *streaming* query over the parquet file
    * source. Watermark bounds state; AvailableNow drains all existing
    * files then stops — the idempotent-batch twin of a long-lived stream. */
  /** Batch read of the events fixture with `ts` normalized to the
    * epoch-nanos-LONG contract every consumer below assumes — the fixture's
    * physical type has drifted between TIMESTAMP(NANOS) and
    * TIMESTAMP(MICROS, NTZ), so delegate to the shared normalizer. */
  private def readEvents(spark: SparkSession, eventsDir: String) = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.queries.QueryUtil.normalizeTs(
      spark.read.parquet(s"$eventsDir/events.parquet"))
  }

  /** File-source STREAM over the events fixture, `ts` normalized the same
    * way. The readStream schema must be the file's RAW schema (a declared
    * LONG over a physical timestamp column would mis-read), so infer it
    * from a batch read and normalize the streaming frame afterwards —
    * `normalizeTs` is a pure projection, legal on streaming plans. */
  private def streamEvents(spark: SparkSession, eventsDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$eventsDir/events.parquet").schema
    graft.queries.QueryUtil.normalizeTs(
      spark.readStream.schema(raw)
        .option("pathGlobFilter", "events.parquet")
        .parquet(eventsDir))
  }

  def hourlyCountsStream(
      spark: SparkSession,
      eventsDir: String,
      queryName: String,
      watermark: String = "1 hour"): StreamingQuery = {
    val events = streamEvents(spark, eventsDir)
      .withColumn("ts_t", timestamp_micros(expr("ts DIV 1000")))
    events
      .withWatermark("ts_t", watermark)
      .groupBy(window(col("ts_t"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(28, 6))).cast(DoubleType).as("sum_value"))
      .select(
        unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("n"), col("sum_value"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** SLIDING-window counts (1h window / 15min slide) as a streaming query:
    * each event contributes to 4 overlapping windows, the watermark closes
    * windows once event time passes their end. The streaming twin of the
    * q_events_sliding batch query — per-window state is bounded by
    * (windowDuration / slide) × |open slides|, not by the stream length. */
  def slidingCountsStream(
      spark: SparkSession,
      eventsDir: String,
      queryName: String,
      watermark: String = "1 hour"): StreamingQuery = {
    streamEvents(spark, eventsDir)
      .withColumn("ts_t", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("ts_t", watermark)
      .groupBy(window(col("ts_t"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(28, 6))).cast(DoubleType).as("sum_value"))
      .select(
        unix_micros(col("window.start")).as("win_us"),
        col("event_type"), col("n"), col("sum_value"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Batch twin of the sliding-window aggregation (same `window()` call in
    * batch mode — identical window assignment by construction). */
  def slidingCountsBatch(spark: SparkSession, eventsDir: String): DataFrame =
    readEvents(spark, eventsDir)
      .withColumn("ts_t", timestamp_micros(expr("ts DIV 1000")))
      .groupBy(window(col("ts_t"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(28, 6))).cast(DoubleType).as("sum_value"))
      .select(
        unix_micros(col("window.start")).as("win_us"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("win_us", "event_type")

  // ---- stateful sessionization (flatMapGroupsWithState) -----------------

  final case class SessEvent(user_id: Long, ts: Long)
  final case class SessState(sessionId: Long, startTs: Long, lastTs: Long, n: Long)
  final case class SessOut(user_id: Long, session_id: Long, n_events: Long,
      start_ts: Long, end_ts: Long)

  /** Custom per-key state machine: events of one user fold through
    * GroupState, emitting a session row whenever the gap exceeds
    * `gapNanos` (and the open session on batch end). The streaming twin of
    * TimeOps.sessionize — state size is O(1) per key, so a 1000-executor
    * stream holds only (#active keys) session records. */
  def sessionizeStream(
      spark: SparkSession,
      eventsDir: String,
      queryName: String,
      gapNanos: Long = 30L * 60 * 1000 * 1000 * 1000): StreamingQuery = {
    import spark.implicits._
    val stream = streamEvents(spark, eventsDir)
      .select(col("user_id"), col("ts"))
      .as[SessEvent]

    def fn(userId: Long, events: Iterator[SessEvent],
        state: GroupState[SessState]): Iterator[SessOut] = {
      val sorted = events.toSeq.sortBy(_.ts)
      val out = Seq.newBuilder[SessOut]
      var st = state.getOption.orNull
      sorted.foreach { e =>
        st = st match {
          case null => SessState(1L, e.ts, e.ts, 1L)
          case s if e.ts - s.lastTs > gapNanos =>
            out += SessOut(userId, s.sessionId, s.n, s.startTs, s.lastTs)
            SessState(s.sessionId + 1, e.ts, e.ts, 1L)
          case s => s.copy(lastTs = e.ts, n = s.n + 1)
        }
      }
      if (st != null) {
        // AvailableNow drains everything in one batch: flush the open
        // session so batch-equivalence holds; a live stream would keep it
        // in state and use a timeout instead
        out += SessOut(userId, st.sessionId, st.n, st.startTs, st.lastTs)
        state.remove()
      }
      out.result().iterator
    }

    stream
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  // ---- stateful as-of enrichment (flatMapGroupsWithState) ---------------

  final case class EnrichEvent(user_id: Long, ts: Long, side: Int, event_id: Long)
  final case class ClickState(click_id: Long, click_ts: Long)
  final case class EnrichOut(event_id: Long, user_id: Long, pts: Long,
      click_id: Option[Long], click_ts: Option[Long])

  /** Streaming twin of the backward as-of join (`q_asof_join` /
    * `q_asof_native`): purchases are enriched with the user's latest
    * click SO FAR. Clicks and purchases arrive as one keyed stream; per
    * key the batch's events replay in (ts, side, event_id) order — clicks
    * first at equal ts so equality matches, ascending event_id so the
    * greatest click id wins a (key, ts) tie, both exactly the batch
    * operator's contract — and the GroupState carries only the LATEST
    * click across micro-batches: O(1) state per key, the property that
    * lets a 1000-executor stream enrich indefinitely where a stream-side
    * buffer of click history would grow without bound.
    *
    * Cross-batch disorder: state only advances, and a purchase never
    * attaches a click with ts beyond its own (as-of `<=` holds under ANY
    * batch split); the O(1)-state trade is that a purchase arriving
    * before its matching click's batch serves null rather than waiting —
    * the watermark-buffer variant would trade state growth for that. */
  def asofEnrichStream(
      spark: SparkSession,
      eventsDir: String,
      queryName: String): StreamingQuery = {
    import spark.implicits._
    val stream = streamEvents(spark, eventsDir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), expr("ts DIV 1000").as("ts"),
        when(col("event_type") === "purchase", 1).otherwise(0).as("side"),
        col("event_id"))
      .as[EnrichEvent]

    def fn(userId: Long, events: Iterator[EnrichEvent],
        state: GroupState[ClickState]): Iterator[EnrichOut] = {
      val sorted = events.toSeq.sortBy(e => (e.ts, e.side, e.event_id))
      val out = Seq.newBuilder[EnrichOut]
      var st = state.getOption.orNull
      sorted.foreach { e =>
        if (e.side == 0) {
          // state only ADVANCES (ts, then id — the batch tie-break): an
          // out-of-order older click from a later micro-batch must not
          // clobber newer carried state
          if (st == null || st.click_ts < e.ts
              || (st.click_ts == e.ts && st.click_id < e.event_id))
            st = ClickState(e.event_id, e.ts)
        } else {
          // the carried state may be AHEAD of an out-of-order purchase
          // from a later micro-batch — as-of semantics (rightTs <= leftTs)
          // must still hold, so a future click never attaches
          val m = Option(st).filter(_.click_ts <= e.ts)
          out += EnrichOut(e.event_id, userId, e.ts,
            m.map(_.click_id), m.map(_.click_ts))
        }
      }
      if (st != null) state.update(st) // latest click survives the batch
      out.result().iterator
    }

    stream
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Streaming dedup WITHIN the watermark gap: the first arrival of each
    * key survives, and the watermark BOUNDS the dedup state — which is
    * what makes infinite-stream dedup feasible at scale (an unbounded
    * `dropDuplicates` grows state forever). The deliberate trade versus
    * batch `exactDistinct`: a key recurring AFTER its state was evicted
    * (events further apart than the watermark) is emitted again, so the
    * output can carry more rows than batch distinct — same key SET,
    * bounded multiplicity, bounded state. */
  def distinctKeysStream(
      spark: SparkSession,
      eventsDir: String,
      queryName: String,
      watermark: String = "1 hour"): StreamingQuery = {
    streamEvents(spark, eventsDir)
      .withColumn("ts_t", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("ts_t", watermark)
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select(col("user_id"), col("event_type"))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Stream-stream interval join: each purchase joined to the same user's
    * clicks in the preceding 30 minutes. Both sides carry watermarks and
    * the join condition bounds event time on both sides, so Spark can
    * expire join state — the ONLY shape that holds on infinite streams
    * (an unbounded stream-stream join buffers a side forever). */
  def purchaseClickJoinStream(
      spark: SparkSession,
      eventsDir: String,
      queryName: String,
      watermark: String = "1 hour"): StreamingQuery = {
    def side(eventType: String, tsName: String, userName: String) =
      streamEvents(spark, eventsDir)
        .filter(col("event_type") === eventType)
        .select(col("user_id").as(userName),
          timestamp_micros(expr("ts DIV 1000")).as(tsName))
        .withWatermark(tsName, watermark)
    val purchases = side("purchase", "pts", "user_id")
    val clicks = side("click", "cts", "c_user")
    purchases.join(clicks,
      expr("user_id = c_user AND cts >= pts - INTERVAL 30 MINUTES AND cts <= pts"))
      .select(col("user_id"),
        unix_micros(col("pts")).as("pts_us"),
        unix_micros(col("cts")).as("cts_us"))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Batch twin of the stream-stream interval join. */
  def purchaseClickJoinBatch(spark: SparkSession, eventsDir: String): DataFrame = {
    val ev = readEvents(spark, eventsDir)
      .withColumn("t", timestamp_micros(expr("ts DIV 1000")))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("t").as("pts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("t").as("cts"))
    purchases.join(clicks,
      expr("user_id = c_user AND cts >= pts - INTERVAL 30 MINUTES AND cts <= pts"))
      .select(col("user_id"),
        unix_micros(col("pts")).as("pts_us"),
        unix_micros(col("cts")).as("cts_us"))
  }

  // ---- transformWithState (the Spark 4 arbitrary-state API) -------------

  final case class SpendEvent(user_id: Long, ts: Long, event_id: Long, value: Double)
  final case class SpendState(n: Long, cents: Long)
  final case class SpendOut(user_id: Long, ts: Long, event_id: Long,
      n_events: Long, cum_cents: Long)

  /** Per-user running purchase totals via `transformWithState` — the
    * Spark 4 successor to flatMapGroupsWithState: named typed state
    * primitives (ValueState here; ListState/MapState, TTL, timers in the
    * same handle) on a RocksDB-backed store, so per-key state scales to
    * disk instead of executor heap. State per user is O(1) — a (count,
    * cents) pair — the shape that holds on an infinite stream.
    *
    * Money accumulates in integer cents: `BigDecimal.valueOf(v * 100)
    * .setScale(0, HALF_UP)` — the exact arithmetic Spark's `round()`
    * applies, so the batch twin reproduces the stream bit-for-bit.
    * Within a batch the key's rows replay in (ts, event_id) order; state
    * then carries across micro-batches in arrival order. */
  class RunningSpendProcessor
      extends StatefulProcessor[Long, SpendEvent, SpendOut] {
    @transient private var state: ValueState[SpendState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SpendState]("spend",
        Encoders.product[SpendState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[SpendEvent],
        timerValues: TimerValues): Iterator[SpendOut] = {
      val sorted = rows.toArray.sortBy(e => (e.ts, e.event_id))
      var st = if (state.exists()) state.get() else SpendState(0L, 0L)
      val out = sorted.map { e =>
        val cents = java.math.BigDecimal.valueOf(e.value * 100)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
        st = SpendState(st.n + 1, st.cents + cents)
        SpendOut(key, e.ts, e.event_id, st.n, st.cents)
      }
      state.update(st)
      out.iterator
    }
  }

  def runningSpendStream(
      spark: SparkSession,
      eventsDir: String,
      queryName: String): StreamingQuery = {
    import spark.implicits._
    // transformWithState requires the RocksDB provider (HDFS-backed state
    // does not implement the new primitives). NOTE: the provider is a
    // session-level conf read at query start, so this PINS the session's
    // later stateful streams to RocksDB too — fine for new queries
    // (RocksDB implements every stateful op), but a checkpoint WRITTEN
    // under the HDFS provider cannot resume under RocksDB; resume such a
    // query from a separate session (`spark.newSession()`).
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    streamEvents(spark, eventsDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .as[SpendEvent]
      .groupByKey(_.user_id)
      .transformWithState(new RunningSpendProcessor,
        TimeMode.None(), OutputMode.Append())
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Batch twin of [[runningSpendStream]]: the same running totals as a
    * cumulative window in (ts, event_id) order with `round(value*100)`
    * cents — Spark's `round` is the HALF_UP-on-decimal-string the
    * processor applies, so the two paths are bit-identical. */
  def runningSpendBatch(spark: SparkSession, eventsDir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    readEvents(spark, eventsDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .select(col("user_id"), col("ts"), col("event_id"),
        count(lit(1)).over(w).as("n_events"),
        sum(col("cents")).over(w).as("cum_cents"))
  }

  /** Batch twin of the streaming aggregation — identical window semantics,
    * used for correctness cross-checks (a DuckDB oracle can't run a
    * stream, but it can run this). */
  def hourlyCountsBatch(spark: SparkSession, eventsDir: String): DataFrame =
    readEvents(spark, eventsDir)
      .withColumn("ts_t", timestamp_micros(expr("ts DIV 1000")))
      .groupBy(
        unix_timestamp(date_trunc("hour", col("ts_t"))).as("win_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(28, 6))).cast(DoubleType).as("sum_value"))
      .orderBy("win_start", "event_type")

  // ---- decayed popularity counters (streaming state + serve) -----------

  /** Daily-count STATE stream — the q_decayed_counts aggregate maintained
    * incrementally: state is ONE LONG per (event_type, day) however many
    * events stream through, and the decayed serve ([[decayedFromDaily]])
    * is a projection over state, never a rescan of events. Counter
    * addition is the ⊕-merge, so per-batch counts roll up exactly (the
    * CountMin/IncrementalAgg contract — redelivery must be deduplicated
    * upstream, as in LandIngest). */
  def dailyCountsStream(
      spark: SparkSession,
      eventsDir: String,
      queryName: String): StreamingQuery =
    streamEvents(spark, eventsDir)
      .groupBy(expr("ts DIV 86400000000000").as("day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Trailing-8-day half-per-day decayed popularity served from a
    * (day, event_type, cnt) state table — the exact projection
    * q_decayed_counts runs after its batch aggregate (same integer
    * shift weights, one final division by 128). */
  def decayedFromDaily(daily: DataFrame): DataFrame = {
    val mx = daily.agg(max("day").as("maxday"))
    daily.crossJoin(broadcast(mx))
      .withColumn("k", (col("maxday") - col("day")).cast("int"))
      .filter(col("k") <= 7)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        (sum(expr("cnt * shiftleft(CAST(1 AS BIGINT), 7 - k)")).cast("double")
          / lit(128.0)).as("decayed"))
      .orderBy("event_type")
  }
}
