package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class PostcodeSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.session

  private def read(rows: Int = 1000, partitions: Int = 4) =
    spark.read.format("graft.sources.PostcodeSource")
      .option("rows", rows).option("partitions", partitions).load()

  test("full scan yields `rows` rows across `partitions` input partitions") {
    val df = read(1000, 4)
    assert(df.count() == 1000)
    assert(df.rdd.getNumPartitions == 4)
  }

  test("rows are deterministic and match the sequential specification") {
    val r = read().filter(col("index") === 7).collect().head
    val hex = PostcodeSource.md5Hex("7")
    assert(r.getAs[String]("postcode") == PostcodeSource.postcodeOf(hex))
    assert(r.getAs[Int]("quality") == PostcodeSource.qualityOf(hex))
    assert(r.getAs[Int]("eastings") == PostcodeSource.eastingsOf(hex))
    assert(r.getAs[Int]("northings") == PostcodeSource.northingsOf(hex))
    assert(r.getAs[String]("european_electoral_region") == PostcodeSource.regionOf(hex))
    val a = read().orderBy("index").collect()
    val b = read().orderBy("index").collect()
    assert(a.sameElements(b))
  }

  test("index filters push into partition planning: an equality scan plans ONE slice") {
    val df = read(10000, 8).filter(col("index") === 1234L)
    assert(df.rdd.getNumPartitions == 1)
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(1234L))
    val range = read(10000, 8).filter(col("index") >= 9900L)
    // 100 surviving rows over 8 requested slices: all 8 planned, but each
    // covers only the surviving range
    assert(range.count() == 100)
  }

  test("column pruning reaches the reader: scan schema carries only requested fields") {
    val df = read().select("index", "quality")
    val scans = df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
    assert(scans.nonEmpty)
    assert(scans.head.scan.readSchema().fieldNames.toSeq == Seq("index", "quality"))
  }

  test("micro-batch stream drains to the batch result under AvailableNow, rate-limited") {
    import org.apache.spark.sql.streaming.Trigger
    val ckpt = java.nio.file.Files.createTempDirectory("graft_pc_stream").toString
    val batches = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = spark.readStream.format("graft.sources.PostcodeSource")
      .option("rows", 1000).option("partitions", 4).option("rowsPerBatch", 300)
      .load()
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        batches.synchronized { batches += ((id, df.count())) }; ()
      }
      .start()
    q.awaitTermination(120000)
    // 1000 rows at <=300/batch: 4 batches, sizes 300/300/300/100
    assert(batches.map(_._2).sum == 1000, s"batches: $batches")
    assert(batches.size == 4 && batches.map(_._2).max <= 300)
    // stream contents equal the batch read, row for row
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft_pc_stream2").toString
    var streamed: Array[org.apache.spark.sql.Row] = Array.empty
    val q2 = spark.readStream.format("graft.sources.PostcodeSource")
      .option("rows", 200).option("partitions", 4).load()
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt2)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val part = df.collect()
        streamed = streamed ++ part; ()
      }
      .start()
    q2.awaitTermination(120000)
    val batch = read(200, 4).collect()
    assert(streamed.sortBy(_.getLong(0)).sameElements(batch.sortBy(_.getLong(0))))
  }

  test("aggregate pushdown: count/min/max over a trillion rows is range arithmetic") {
    val t0 = System.nanoTime()
    val r = spark.read.format("graft.sources.PostcodeSource")
      .option("rows", 1000000000000L).option("partitions", 8).load()
      .filter(col("index") >= 1000L && col("index") < 999999999999L)
      .agg(count(lit(1)).as("n"), min(col("index")).as("mn"), max(col("index")).as("mx"))
      .collect().head
    val elapsedSec = (System.nanoTime() - t0) / 1e9
    assert(r.getLong(0) == 999999998999L)
    assert(r.getLong(1) == 1000L && r.getLong(2) == 999999999998L)
    // a generated scan of 10^12 rows would run for hours; arithmetic doesn't
    assert(elapsedSec < 30, s"agg pushdown did not bypass generation: ${elapsedSec}s")
    // empty surviving range: count 0, null extrema (SQL semantics)
    val e = spark.read.format("graft.sources.PostcodeSource")
      .option("rows", 100).load()
      .filter(col("index") > 1000L)
      .agg(count(col("index")).as("n"), min(col("index")).as("mn"))
      .collect().head
    assert(e.getLong(0) == 0L && e.isNullAt(1))
  }

  test("pushed filters and surviving range surface in the scan description") {
    val df = read(10000, 8).filter(col("index") >= 5000L && col("index") < 6000L)
    val scans = df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
    assert(scans.head.scan.description().contains("range=[5000,6000)"))
  }

  test("LIMIT pushdown truncates the range; rows beyond it are never planned") {
    val df = read(100000, 8).limit(7)
    assert(df.collect().length == 7)
    val scans = df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
    assert(scans.head.scan.description().contains("range=[0,7)"))

    // composes with filter pushdown: the limit applies to the SURVIVING range
    val f = read(100000, 8).filter(col("index") >= 100L).limit(10)
    assert(f.collect().map(_.getAs[Long]("index")).sorted.toSeq == (100L to 109L))
    val fs = f.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
    assert(fs.head.scan.description().contains("range=[100,110)"))
  }

  test("ORDER BY index DESC LIMIT pushes top-N: only the tail slice is planned") {
    val df = read(100000, 8).orderBy(col("index").desc).limit(3)
    assert(df.collect().map(_.getAs[Long]("index")).toSeq == Seq(99999L, 99998L, 99997L))
    val scans = df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
    assert(scans.head.scan.description().contains("range=[99997,100000)"))
  }

  test("a pushed aggregate refuses limit truncation: the count stays exact") {
    val n = read(1000000, 8).agg(count(lit(1)).as("n")).limit(1)
      .collect().head.getLong(0)
    assert(n == 1000000L)
  }
}
