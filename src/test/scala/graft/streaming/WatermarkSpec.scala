package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Late-data semantics: with an event-time watermark in append mode, a
  * window only emits once the watermark passes its end, and events older
  * than the watermark are dropped — exercised with a two-batch file
  * source. */
class WatermarkSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.session
  import spark.implicits._

  test("watermark drops late events and finalizes windows in append mode") {
    val dir = Files.createTempDirectory("graft_wm").toString
    val stage = Files.createTempDirectory("graft_wm_stage").toString
    // the file stream source watches a flat directory: stage each batch as
    // one parquet file moved in atomically
    def writeBatch(name: String, rows: Seq[(java.sql.Timestamp, String)]): Unit = {
      val tmp = s"$stage/$name"
      rows.toDF("ts", "k").coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, java.nio.file.Paths.get(s"$dir/$name.parquet"))
    }
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

    // batch 1: events in windows [10:00,10:05) and [10:10,10:15)
    writeBatch("b1", Seq((ts(1), "a"), (ts(2), "a"), (ts(11), "b")))

    val schema = spark.read.parquet(s"$dir/b1.parquet").schema
    val agg = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .withWatermark("ts", "5 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("k"))
      .count()
      .select(col("window.start").cast("string").as("win"), col("k"), col("count"))

    val qname = "wm_test"
    val q = agg.writeStream.outputMode("append").format("memory")
      .queryName(qname).trigger(Trigger.ProcessingTime("500 milliseconds")).start()
    try {
      q.processAllAvailable()
      // watermark advances to 10:11-5m = 10:06 and the no-data microbatch
      // finalizes [10:00,10:05) immediately; [10:10,10:15) stays open
      val emitted1 = spark.table(qname)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      assert(emitted1.toSeq == Seq(("2024-01-01 10:00:00", "a", 2L)))

      // batch 2: one event at 10:03 — BEFORE the 10:06 watermark (late,
      // dropped) — and one at 10:21 advancing the watermark past 10:15
      writeBatch("b2", Seq((ts(3), "late"), (ts(21), "c")))
      q.processAllAvailable()
      val rows = spark.table(qname)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      // the late event never appears in any emitted window
      assert(!rows.exists(_._2 == "late"))
      // [10:10,10:15) got finalized once the watermark passed its end
      assert(rows.exists(r => r._1 == "2024-01-01 10:10:00" && r._2 == "b" && r._3 == 1L))
    } finally q.stop()
  }
}
