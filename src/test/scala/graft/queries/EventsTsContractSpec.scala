package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Fixture-drift guard: the events fixture's physical `ts` type has
  * drifted between parquet TIMESTAMP(NANOS) (readable only as a nanos
  * LONG under the legacy conf) and TIMESTAMP(MICROS, NTZ). Every events
  * consumer assumes the epoch-nanos-LONG contract, so `QueryUtil.events`
  * must normalize EITHER physical encoding to the identical frame — this
  * spec writes the same rows both ways and asserts frame equality, so a
  * future fixture regeneration can't silently break 16 queries again. */
class EventsTsContractSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.session

  test("QueryUtil.events yields the same frame from micros-timestamp and nanos-long fixtures") {
    import spark.implicits._
    val dir = Files.createTempDirectory("events-ts-contract").toFile
    val asLong = Files.createTempDirectory("events-ts-long").toFile
    try {
      val rows = Seq(
        (1L, 1704067200000000L, 10L, "click", 1.5),    // 2024-01-01T00:00Z
        (2L, 1704067201500000L, 10L, "purchase", 9.99),
        (3L, 1704153599999999L, 11L, "view", 0.0))     // end-of-day µs edge

      // encoding A: TIMESTAMP_NTZ micros (the current fixture shape)
      rows.toDF("event_id", "ts_us", "user_id", "event_type", "value")
        .select(col("event_id"),
          timestamp_micros(col("ts_us")).cast(TimestampNTZType).as("ts"),
          col("user_id"), col("event_type"), col("value"))
        .coalesce(1).write.mode("overwrite")
        .parquet(s"${dir.getAbsolutePath}/events.parquet")

      // encoding B: plain LONG nanos (what TIMESTAMP(NANOS) arrives as
      // under spark.sql.legacy.parquet.nanosAsLong)
      rows.toDF("event_id", "ts_us", "user_id", "event_type", "value")
        .select(col("event_id"), (col("ts_us") * 1000L).as("ts"),
          col("user_id"), col("event_type"), col("value"))
        .coalesce(1).write.mode("overwrite")
        .parquet(s"${asLong.getAbsolutePath}/events.parquet")

      val a = QueryUtil.events(spark, dir.getAbsolutePath)
      val b = QueryUtil.events(spark, asLong.getAbsolutePath)

      assert(a.schema("ts").dataType === LongType)
      assert(b.schema("ts").dataType === LongType)
      val av = a.orderBy("event_id").collect().toSeq
      val bv = b.orderBy("event_id").collect().toSeq
      assert(av === bv)
      // and the values are the true epoch nanos
      assert(av.map(_.getLong(1)) ===
        Seq(1704067200000000000L, 1704067201500000000L, 1704153599999999000L))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir); rm(asLong)
    }
  }

  test("the real fixture reads under the contract: ts is LONG nanos in plausible range") {
    val ev = QueryUtil.events(spark, SparkTestBase.sf0001)
    assert(ev.schema("ts").dataType === LongType)
    val bounds = ev.agg(min("ts"), max("ts")).head()
    // nanos since epoch for any date between 2001 and 2100 — a micros or
    // millis value would fall far below this band
    assert(bounds.getLong(0) > 1.0e18.toLong)
    assert(bounds.getLong(1) < 4.1e18.toLong)
  }
}
