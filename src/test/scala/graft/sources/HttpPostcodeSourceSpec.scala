package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The connector's NETWORK face against the in-process API twin: real
  * sockets, paging, wire-level pruning, retry — not the generator. */
class HttpPostcodeSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.session

  private def http(rows: Int, partitions: Int = 4, page: Int = 100) =
    spark.read.format("graft.sources.PostcodeSource")
      .option("rows", rows).option("partitions", partitions)
      .option("rowsPerBatch", page)
      .option("url", PostcodeApiTwin.url)
      .load()

  private def generated(rows: Int, partitions: Int = 4) =
    spark.read.format("graft.sources.PostcodeSource")
      .option("rows", rows).option("partitions", partitions)
      .load()

  test("HTTP rows are byte-identical to the generator (socket+JSON path proven)") {
    val viaHttp = http(400).orderBy("index").collect()
    val viaGen = generated(400).orderBy("index").collect()
    assert(viaHttp.length === 400)
    assert(viaHttp.map(_.toSeq).toSeq === viaGen.map(_.toSeq).toSeq)
  }

  test("column pruning travels on the wire: requests carry only the projected cols") {
    PostcodeApiTwin.requests.clear()
    val out = http(300, partitions = 2)
      .select("index", "quality").orderBy("index").collect()
    assert(out.length === 300)
    val reqs = PostcodeApiTwin.requests.asScala.toSeq
    assert(reqs.nonEmpty)
    reqs.foreach { r =>
      val cols = "cols=([^&]*)".r.findFirstMatchIn(r).map(_.group(1)).get
      assert(cols === "index,quality", s"unpruned request: $r")
    }
  }

  test("pushed index filter + limit shrink the requested ranges before any fetch") {
    PostcodeApiTwin.requests.clear()
    val n = http(100000, partitions = 4, page = 50)
      .filter(col("index") >= 200 && col("index") < 360)
      .limit(60) // pushed: range truncates to [200, 260)
      .count()
    assert(n === 60)
    val reqs = PostcodeApiTwin.requests.asScala.toSeq
    val total = reqs.map { r =>
      "count=(\\d+)".r.findFirstMatchIn(r).map(_.group(1).toLong).getOrElse(0L)
    }.sum
    assert(total === 60, s"fetched $total rows for a pushed-down 60: $reqs")
    // and no request starts below the pushed lower bound
    reqs.foreach { r =>
      val s = "start=(\\d+)".r.findFirstMatchIn(r).map(_.group(1).toLong).get
      assert(s >= 200 && s < 260, s"out-of-range fetch: $r")
    }
  }

  test("a transient 503 retries the page and the result is still exact") {
    PostcodeApiTwin.injectFailure()
    val out = http(120, partitions = 1, page = 40).agg(
      count(lit(1)).cast("long").as("n"),
      sum(col("quality")).as("sq")).head()
    val exp = generated(120).agg(
      count(lit(1)).cast("long").as("n"),
      sum(col("quality")).as("sq")).head()
    assert(out === exp)
  }

  test("aggregate pushdown needs no network at all (range arithmetic)") {
    PostcodeApiTwin.requests.clear()
    val n = http(1000000).count()
    assert(n === 1000000L)
    assert(PostcodeApiTwin.requests.isEmpty,
      s"count(*) contacted the server: ${PostcodeApiTwin.requests.asScala.toSeq}")
  }

  test("micro-batch streaming ingestion over the network face drains to the batch result") {
    import org.apache.spark.sql.streaming.Trigger
    val ckpt = java.nio.file.Files.createTempDirectory("graft_http_stream").toString
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    var streamed: Array[org.apache.spark.sql.Row] = Array.empty
    val q = spark.readStream.format("graft.sources.PostcodeSource")
      .option("rows", 500).option("partitions", 4).option("rowsPerBatch", 200)
      .option("url", PostcodeApiTwin.url)
      .load()
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val part = df.collect()
        batches.synchronized { batches += part.length.toLong; streamed = streamed ++ part }
        ()
      }
      .start()
    q.awaitTermination(120000)
    // 500 rows at <=200/batch over HTTP: 3 micro-batches, every row fetched
    // over the wire, byte-identical to the generator batch read
    assert(batches.sum === 500 && batches.max <= 200, s"batches: $batches")
    val batch = generated(500).collect()
    assert(streamed.sortBy(_.getLong(0)).map(_.toSeq).toSeq ===
      batch.sortBy(_.getLong(0)).map(_.toSeq).toSeq)
  }
}
