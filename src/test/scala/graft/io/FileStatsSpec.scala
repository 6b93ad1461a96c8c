package graft.io

import org.apache.hadoop.fs.Path
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/**
 * Parquet-footer column statistics: bounds/null counts lifted
 * metadata-only must agree with what a FULL SCAN of the same file
 * computes — the soundness contract every data-skipping consumer
 * ([[DeltaLog]] stats, [[IcebergExport]] bounds) leans on.
 */
class FileStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.session
  import spark.implicits._

  private def tmpDir() =
    java.nio.file.Files.createTempDirectory("filestats").toString

  private def conf = spark.sparkContext.hadoopConfiguration

  private def onlyParquet(dir: String): Path = {
    val fs = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(fs.length == 1, s"expected one part file under $dir")
    new Path(fs.head.getAbsolutePath)
  }

  test("footer bounds equal full-scan extrema across every covered type") {
    val dir = tmpDir()
    spark.sql(
      """SELECT * FROM VALUES
        |  (1L, 10, 2.5D, CAST(1.5 AS FLOAT), 'apple', true,
        |   DATE'2020-02-29', TIMESTAMP'2021-06-01 12:30:45.123456'),
        |  (7L, -3, -0.5D, CAST(9.25 AS FLOAT), 'zebra', false,
        |   DATE'2023-11-05', TIMESTAMP'2019-01-01 00:00:00'),
        |  (4L, NULL, 8.125D, CAST(2.0 AS FLOAT), NULL, true,
        |   DATE'2021-07-14', TIMESTAMP'2020-12-31 23:59:59.999999')
        |AS t(l, i, d, f, s, b, dt, ts)""".stripMargin)
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val st = FileStats.readFooter(onlyParquet(dir), conf)
    assert(st.numRecords == 3)
    assert(st.size > 0 && st.modTime > 0)
    val cols = st.columns.toMap
    assert(cols("l").min.contains(1L) && cols("l").max.contains(7L))
    assert(cols("i").min.contains(-3L) && cols("i").max.contains(10L))
    assert(cols("i").nullCount.contains(1L))
    assert(cols("d").min.contains(-0.5) && cols("d").max.contains(8.125))
    // float widens exactly into the double space
    assert(cols("f").min.contains(1.5) && cols("f").max.contains(9.25))
    assert(cols("s").min.contains("apple") && cols("s").max.contains("zebra"))
    assert(cols("s").nullCount.contains(1L))
    assert(cols("b").min.contains(false) && cols("b").max.contains(true))
    assert(cols("b").kind == FileStats.Kind.Bool)
    // date = epoch-day long
    assert(cols("dt").kind == FileStats.Kind.Date)
    assert(cols("dt").min.contains(
      java.time.LocalDate.parse("2020-02-29").toEpochDay))
    assert(cols("dt").max.contains(
      java.time.LocalDate.parse("2023-11-05").toEpochDay))
    // timestamp = epoch-micros long, whatever the physical unit
    assert(cols("ts").kind.isInstanceOf[FileStats.Kind.Ts])
    def micros(s: String) = {
      val i = java.time.Instant.parse(s)
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    assert(cols("ts").min.contains(micros("2019-01-01T00:00:00Z")))
    assert(cols("ts").max.contains(micros("2021-06-01T12:30:45.123456Z")))
  }

  test("all-null column keeps nullCount with no bounds; NaN double drops bounds") {
    val dir = tmpDir()
    spark.sql(
      """SELECT * FROM VALUES
        |  (1L, CAST(NULL AS STRING), CAST('NaN' AS DOUBLE)),
        |  (2L, CAST(NULL AS STRING), 1.0D)
        |AS t(id, dead, nan)""".stripMargin)
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val st = FileStats.readFooter(onlyParquet(dir), conf)
    val cols = st.columns.toMap
    val dead = cols("dead")
    assert(dead.min.isEmpty && dead.max.isEmpty)
    assert(dead.nullCount.contains(2L), "all-null must be PROVEN by nullCount")
    // a NaN that reached the footer makes the bounds untrustworthy —
    // whichever way the writer handled it, no unsound bound may surface
    cols.get("nan").foreach { c =>
      (c.min, c.max) match {
        case (Some(mn), Some(mx)) =>
          assert(!mn.asInstanceOf[Double].isNaN && !mx.asInstanceOf[Double].isNaN)
          assert(mn.asInstanceOf[Double] <= 1.0 && mx.asInstanceOf[Double] >= 1.0)
        case _ => // dropped entirely — also sound
      }
    }
  }

  test("multi-row-group files merge bounds across groups") {
    val dir = tmpDir()
    spark.range(0, 20000).selectExpr("id", "md5(CAST(id AS STRING)) AS pad")
      .coalesce(1).write.mode("overwrite")
      .option("parquet.block.size", "65536") // force several row groups
      .parquet(dir)
    val p = onlyParquet(dir)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf))
    val groups = try reader.getFooter.getBlocks.size finally reader.close()
    assert(groups > 1, s"need multiple row groups, got $groups")
    val st = FileStats.readFooter(p, conf)
    assert(st.numRecords == 20000)
    val cols = st.columns.toMap
    assert(cols("id").min.contains(0L) && cols("id").max.contains(19999L))
  }

  test("collect() is a distributed pass returning the same stats per file") {
    val dir = tmpDir()
    val base = new Path(dir)
    (1 to 3).foreach { i =>
      spark.range(i * 100, i * 100 + 50).toDF("id")
        .coalesce(1).write.parquet(s"$dir/d$i")
    }
    val rels = (1 to 3).flatMap { i =>
      new java.io.File(s"$dir/d$i").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(f => s"d$i/${f.getName}")
    }
    val m = FileStats.collect(spark, base, rels)
    assert(m.keySet == rels.toSet)
    (1 to 3).foreach { i =>
      val fst = m(rels.find(_.startsWith(s"d$i/")).get)
      assert(fst.numRecords == 50)
      assert(fst.columns.toMap.apply("id").min.contains(i * 100L))
      assert(fst.columns.toMap.apply("id").max.contains(i * 100L + 49L))
    }
    assert(FileStats.collect(spark, base, Nil).isEmpty)
  }

  test("deltaStatsJson renders the protocol's stats schema") {
    val dir = tmpDir()
    spark.sql(
      """SELECT * FROM VALUES
        |  (3L, 'b', DATE'2021-01-02', TIMESTAMP'2021-01-02 03:04:05.123456',
        |   CAST(NULL AS INT)),
        |  (9L, 'a', DATE'2022-03-04', TIMESTAMP'2022-03-04 05:06:07',
        |   CAST(NULL AS INT))
        |AS t(k, s, dt, ts, dead)""".stripMargin)
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val st = FileStats.readFooter(onlyParquet(dir), conf)
    val j = JsonMethods.parse(FileStats.deltaStatsJson(st))
    assert(j \ "numRecords" == JInt(2))
    assert(j \ "minValues" \ "k" == JInt(3))
    assert(j \ "maxValues" \ "k" == JInt(9))
    assert(j \ "minValues" \ "s" == JString("a"))
    assert(j \ "maxValues" \ "s" == JString("b"))
    // fixed-width ISO renderings: lexicographic order == value order
    assert(j \ "minValues" \ "dt" == JString("2021-01-02"))
    assert(j \ "maxValues" \ "dt" == JString("2022-03-04"))
    val JString(tsMin) = j \ "minValues" \ "ts"
    assert(tsMin.startsWith("2021-01-02T03:04:05.123456"))
    // all-null column: in nullCount, absent from the bounds maps
    assert(j \ "nullCount" \ "dead" == JInt(2))
    assert(j \ "minValues" \ "dead" == JNothing)
    assert(j \ "nullCount" \ "k" == JInt(0))
  }
}
