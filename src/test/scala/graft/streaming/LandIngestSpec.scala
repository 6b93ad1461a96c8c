package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class LandIngestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.session

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))

  private def writeJsonl(dir: Path, file: String, ids: Range): Unit = {
    val lines = ids.map(i => s"""{"id":$i,"name":"row$i"}""").mkString("\n")
    Files.write(dir.resolve(file), lines.getBytes("UTF-8"))
  }

  test("AvailableNow drain promotes once, and only new files on re-run") {
    val base = Files.createTempDirectory("land_ingest")
    val land = Files.createDirectory(base.resolve("land"))
    val raw = base.resolve("raw").toString
    val ckpt = base.resolve("ckpt").toString

    writeJsonl(land, "batch1.jsonl", 0 until 150)
    LandIngest.drainLandZone(spark, land.toString, schema, raw, ckpt, minRows = 100)
    assert(spark.read.parquet(raw).count() === 150)

    // re-run with nothing new: no duplicates (checkpointed exactly-once)
    LandIngest.drainLandZone(spark, land.toString, schema, raw, ckpt, minRows = 100)
    assert(spark.read.parquet(raw).count() === 150)

    // late-arriving land file: only the delta is promoted
    writeJsonl(land, "batch2.jsonl", 1000 until 1120)
    LandIngest.drainLandZone(spark, land.toString, schema, raw, ckpt, minRows = 100)
    val out = spark.read.parquet(raw)
    assert(out.count() === 270)
    assert(out.select("id").distinct().count() === 270)
  }

  test("upsertStream folds change batches into a keyed snapshot (last writer wins)") {
    val base = Files.createTempDirectory("upsert_stream")
    val changes = Files.createDirectory(base.resolve("changes"))
    val snap = base.resolve("snap").toString
    val ckpt = base.resolve("ckpt").toString
    val chSchema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("seq", LongType)))

    def writeChanges(file: String, rows: Seq[(Long, String, Long)]): Unit =
      Files.write(changes.resolve(file),
        rows.map { case (i, n, q) => s"""{"id":$i,"name":"$n","seq":$q}""" }
          .mkString("\n").getBytes("UTF-8"))

    // batch 1: inserts + an intra-batch conflict on id=2 (seq 5 beats 3)
    writeChanges("b1.jsonl", Seq((1L, "a", 1L), (2L, "old", 3L), (2L, "new", 5L)))
    LandIngest.upsertStream(spark, changes.toString, chSchema, "id", "seq", snap, ckpt)
    val s1 = spark.read.parquet(snap).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("name"))).toMap
    assert(s1 === Map(1L -> "a", 2L -> "new"))

    // batch 2: update id=1, insert id=9; id=2 untouched
    writeChanges("b2.jsonl", Seq((1L, "a2", 10L), (9L, "z", 1L)))
    LandIngest.upsertStream(spark, changes.toString, chSchema, "id", "seq", snap, ckpt)
    val s2 = spark.read.parquet(snap).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("name"))).toMap
    assert(s2 === Map(1L -> "a2", 2L -> "new", 9L -> "z"))

    // batch 3 arrives LATE with a stale sequence for id=1: the snapshot
    // must not regress (sequence-ordered, not arrival-ordered)
    writeChanges("b3.jsonl", Seq((1L, "stale", 0L)))
    LandIngest.upsertStream(spark, changes.toString, chSchema, "id", "seq", snap, ckpt)
    val s3 = spark.read.parquet(snap).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("name"))).toMap
    assert(s3 === Map(1L -> "a2", 2L -> "new", 9L -> "z"))
  }

  test("a batch below the row-count gate fails the run before promotion") {
    val base = Files.createTempDirectory("land_ingest_gate")
    val land = Files.createDirectory(base.resolve("land"))
    val raw = base.resolve("raw").toString
    val ckpt = base.resolve("ckpt").toString

    writeJsonl(land, "small.jsonl", 0 until 10)
    val e = intercept[Exception] {
      LandIngest.drainLandZone(spark, land.toString, schema, raw, ckpt, minRows = 100)
    }
    assert(e.getMessage != null)
    assert(!Files.exists(base.resolve("raw")) ||
      spark.read.parquet(raw).count() === 0)
  }

  test("kmvDistinctStream: incremental batches serve the one-shot state bit-for-bit") {
    import graft.ops.ApproxDistinct
    val base = Files.createTempDirectory("kmv_stream")
    val changes = Files.createDirectory(base.resolve("changes"))
    val state = base.resolve("state").toString
    val chSchema = StructType(Seq(
      StructField("grp", LongType), StructField("v", StringType)))
    def writeVals(file: String, rows: Seq[(Long, String)]): Unit =
      Files.write(changes.resolve(file),
        rows.map { case (g, v) => s"""{"grp":$g,"v":"$v"}""" }
          .mkString("\n").getBytes("UTF-8"))

    val all = (1 to 900).map(i => ((i % 3).toLong, s"u${i % 217}"))
    val (b1, b2) = all.splitAt(400)
    writeVals("b1.jsonl", b1)
    LandIngest.kmvDistinctStream(spark, changes.toString, chSchema,
      Seq("grp"), "v", 64, state, base.resolve("ck1").toString)
    writeVals("b2.jsonl", b2)
    LandIngest.kmvDistinctStream(spark, changes.toString, chSchema,
      Seq("grp"), "v", 64, state, base.resolve("ck1").toString)

    def served(st: org.apache.spark.sql.DataFrame) =
      ApproxDistinct.kmvServe(st, Seq("grp"))
        .orderBy("grp").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq

    import spark.implicits._
    val oneShot = ApproxDistinct.kmvBuildState(
      all.toDF("grp", "v"), Seq("grp"), "v", 64)
    // two streamed batches == one-shot batch build, BIT-identical (the
    // KMV set-union property), not merely within error bounds
    assert(served(spark.read.parquet(state)) === served(oneShot))

    // at-least-once safety: replaying ALL data as another batch (fresh
    // checkpoint = full redelivery) changes nothing — idempotent union
    LandIngest.kmvDistinctStream(spark, changes.toString, chSchema,
      Seq("grp"), "v", 64, state, base.resolve("ck2").toString)
    assert(served(spark.read.parquet(state)) === served(oneShot))
  }

  test("histSketchStream: streamed batches reproduce the one-shot sketch; batch replay is a guarded no-op") {
    import graft.ops.HistSketch
    import spark.implicits._
    val base = Files.createTempDirectory("hist_stream")
    val changes = Files.createDirectory(base.resolve("changes"))
    val state = base.resolve("state").toString
    val chSchema = StructType(Seq(
      StructField("grp", StringType), StructField("v", DoubleType)))
    def writeVals(file: String, rows: Seq[(String, Double)]): Unit =
      Files.write(changes.resolve(file),
        rows.map { case (g, v) => s"""{"grp":"$g","v":$v}""" }
          .mkString("\n").getBytes("UTF-8"))

    val rnd = new scala.util.Random(31)
    val all = (1 to 1200).map(i => (if (i % 2 == 0) "a" else "b", rnd.nextInt(5000) / 10.0))
    val (b1, b2) = all.splitAt(500)
    writeVals("b1.jsonl", b1)
    LandIngest.histSketchStream(spark, changes.toString, chSchema,
      Seq("grp"), "v", 0.0, 500.0, 50, state, base.resolve("ck1").toString)
    writeVals("b2.jsonl", b2)
    LandIngest.histSketchStream(spark, changes.toString, chSchema,
      Seq("grp"), "v", 0.0, 500.0, 50, state, base.resolve("ck1").toString)

    def bins(df: org.apache.spark.sql.DataFrame) =
      df.select("grp", "bin", "cnt").orderBy("grp", "bin").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

    // streamed state ≡ one-shot build, BIT-identical (count monoid)
    val oneShot = HistSketch.buildState(
      all.toDF("grp", "v"), Seq("grp"), "v", 0.0, 500.0, 50)
    assert(bins(spark.read.parquet(state)) === bins(oneShot))

    // at-least-once window: re-folding an ALREADY-COMMITTED batchId is
    // refused by the last_batch guard (counts are NOT idempotent — this
    // is the guard that makes foreachBatch replay safe)
    val replay = b2.toDF("grp", "v")
    val lastId = spark.read.parquet(state).select("last_batch").head.getLong(0)
    assert(!LandIngest.foldHistBatch(spark, replay, lastId,
      Seq("grp"), "v", 0.0, 500.0, 50, state))
    assert(bins(spark.read.parquet(state)) === bins(oneShot))
    // ...while a genuinely NEW batch id folds in
    assert(LandIngest.foldHistBatch(spark, replay, lastId + 1,
      Seq("grp"), "v", 0.0, 500.0, 50, state))
    assert(bins(spark.read.parquet(state)) !== bins(oneShot))
  }

  test("extractFromApi: HTTP extract drains incrementally, idempotently, and gates the total") {
    import graft.sources.PostcodeApiTwin
    val base = java.nio.file.Files.createTempDirectory("extract_api").toString
    val land = s"$base/land"
    val ckpt = s"$base/ckpt"
    // first run: 600 rows at <=250/batch over real localhost HTTP
    val n1 = LandIngest.extractFromApi(spark, Some(PostcodeApiTwin.url),
      rows = 600, land, ckpt, rowsPerBatch = 250)
    assert(n1 === 600)
    // re-run with nothing new: offset checkpoint -> no duplicate landing
    val n2 = LandIngest.extractFromApi(spark, Some(PostcodeApiTwin.url),
      rows = 600, land, ckpt, rowsPerBatch = 250)
    assert(n2 === 600)
    // the API "grows": the same checkpoint drains ONLY the 200-row delta
    val n3 = LandIngest.extractFromApi(spark, Some(PostcodeApiTwin.url),
      rows = 800, land, ckpt, rowsPerBatch = 250)
    assert(n3 === 800)
    // landed content is byte-identical to the generator batch read
    val landed = spark.read.parquet(land)
      .select("index", "postcode", "quality", "eastings", "northings",
        "european_electoral_region")
      .orderBy("index").collect().map(_.toSeq).toSeq
    val expected = spark.read.format("graft.sources.PostcodeSource")
      .option("rows", 800).option("partitions", 4).load()
      .orderBy("index").collect().map(_.toSeq).toSeq
    assert(landed === expected)
    // the reference gate fires on a too-small extract
    val tiny = java.nio.file.Files.createTempDirectory("extract_tiny").toString
    val e = intercept[IllegalStateException] {
      LandIngest.extractFromApi(spark, Some(PostcodeApiTwin.url),
        rows = 50, s"$tiny/land", s"$tiny/ckpt")
    }
    assert(e.getMessage.contains("reference gate"))
  }
}
