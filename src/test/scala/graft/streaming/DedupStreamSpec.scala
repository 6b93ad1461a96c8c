package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class DedupStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.session

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("text", StringType)))

  private def writeJsonl(dir: Path, file: String, rows: Seq[String]): Unit =
    Files.write(dir.resolve(file), rows.mkString("\n").getBytes("UTF-8"))

  test("exact dedup across micro-batches; state recovered from checkpoint on restart") {
    val base = Files.createTempDirectory("dedup_stream")
    val land = Files.createDirectory(base.resolve("land"))
    val out = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString

    // batch 1: intra-batch duplicate (ids 1 and 3 share content)
    writeJsonl(land, "b1.jsonl", Seq(
      """{"id":1,"text":"alpha"}""",
      """{"id":2,"text":"beta"}""",
      """{"id":3,"text":"alpha"}"""))
    LandIngest.dedupStream(spark, land.toString, schema, Seq("text"), out, ckpt)
    val s1 = spark.read.parquet(out)
    assert(s1.count() == 2)
    assert(s1.select("text").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().toSet == Set("alpha", "beta"))

    // batch 2, NEW query instance from the same checkpoint (a restart):
    // the cross-batch duplicate is absorbed by the recovered state store
    writeJsonl(land, "b2.jsonl", Seq(
      """{"id":4,"text":"alpha"}""",
      """{"id":5,"text":"gamma"}"""))
    LandIngest.dedupStream(spark, land.toString, schema, Seq("text"), out, ckpt)
    val s2 = spark.read.parquet(out)
    assert(s2.count() == 3) // alpha exactly once, corpus-wide
    assert(s2.filter("text = 'alpha'").count() == 1)
    assert(s2.select("text").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().toSet == Set("alpha", "beta", "gamma"))

    // a third drain with nothing new emits nothing (sink commit log + state)
    LandIngest.dedupStream(spark, land.toString, schema, Seq("text"), out, ckpt)
    assert(spark.read.parquet(out).count() == 3)
  }

  test("watermark-bounded dedup drops in-horizon duplicates across batches") {
    val base = Files.createTempDirectory("dedup_stream_wm")
    val land = Files.createDirectory(base.resolve("land"))
    val out = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString
    val wmSchema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType),
      StructField("ts", TimestampType)))

    writeJsonl(land, "b1.jsonl", Seq(
      """{"id":1,"text":"alpha","ts":"2024-01-01T10:00:00.000Z"}""",
      """{"id":2,"text":"beta","ts":"2024-01-01T10:05:00.000Z"}"""))
    LandIngest.dedupStreamBounded(spark, land.toString, wmSchema, Seq("text"),
      "ts", "1 hour", out, ckpt)
    assert(spark.read.parquet(out).count() == 2)

    // duplicate of alpha 10 minutes later — well inside the 1h horizon —
    // plus a new doc; the dup is dropped even though it arrives in a
    // LATER batch (watermark + state checkpointed between drains)
    writeJsonl(land, "b2.jsonl", Seq(
      """{"id":3,"text":"alpha","ts":"2024-01-01T10:10:00.000Z"}""",
      """{"id":4,"text":"delta","ts":"2024-01-01T10:20:00.000Z"}"""))
    LandIngest.dedupStreamBounded(spark, land.toString, wmSchema, Seq("text"),
      "ts", "1 hour", out, ckpt)
    val s2 = spark.read.parquet(out)
    assert(s2.count() == 3)
    assert(s2.filter("text = 'alpha'").count() == 1)
  }
}
