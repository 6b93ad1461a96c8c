package graft.io

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class TableIOSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.session
  import spark.implicits._

  test("jsonl.gz round-trip with partition discovery and implicit union (O4/O7/O11)") {
    val base = Files.createTempDirectory("graft_io").toString
    val df1 = Seq((1, "a"), (2, "b")).toDF("id", "v")
    val df2 = Seq((3, "c")).toDF("id", "v")
    TableIO.writeJsonlGz(df1, TableIO.landPartitionPath(base, "t", 100L), singleFile = true)
    TableIO.writeJsonlGz(df2, TableIO.landPartitionPath(base, "t", 200L), singleFile = true)
    val all = TableIO.readJson(spark, s"$base/t")
    assert(all.count() == 3) // both partitions unioned
    assert(all.columns.contains(TableIO.LandTimestampCol)) // discovered from path
    assert(all.select(TableIO.LandTimestampCol).distinct().count() == 2)
  }

  test("promote: byte-identical copy then source delete (O10)") {
    val base = Files.createTempDirectory("graft_promote").toString
    val src = s"$base/land/t/file_land_timestamp=1"
    TableIO.writeJsonlGz(Seq((1, "x")).toDF("id", "v"), src, singleFile = true)
    val srcBytes = TableIO.listDataFiles(spark, src)
      .map(p => Files.readAllBytes(java.nio.file.Paths.get(p.stripPrefix("file:"))))
    val dst = s"$base/rawhist/t/file_land_timestamp=1"
    TableIO.promote(spark, src, dst)
    assert(TableIO.listDataFiles(spark, src).isEmpty) // land emptied
    val dstBytes = TableIO.listDataFiles(spark, dst)
      .map(p => Files.readAllBytes(java.nio.file.Paths.get(p.stripPrefix("file:"))))
    assert(dstBytes.map(_.toSeq) == srcBytes.map(_.toSeq)) // byte-identical, not re-serialized
  }

  test("dynamic partition overwrite only replaces touched partitions") {
    val base = Files.createTempDirectory("graft_dyn").toString + "/t"
    val v1 = Seq(("p1", 1), ("p2", 2)).toDF("part", "v")
    TableIO.writePartitionedDynamic(v1, base, Seq("part"))
    val v2 = Seq(("p2", 99)).toDF("part", "v") // only p2 rewritten
    TableIO.writePartitionedDynamic(v2, base, Seq("part"))
    val out = spark.read.parquet(base).orderBy("part")
      .collect().map(r => (r.getAs[String]("part"), r.getAs[Int]("v")))
    assert(out.toSeq == Seq(("p1", 1), ("p2", 99)))
  }

  test("quarantine read splits malformed jsonl lines from good rows") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("quarantine").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "batch.jsonl"),
      Seq("""{"id": 1, "name": "ok"}""",
        """{"id": broken not json""",
        """{"id": 2, "name": "fine"}""").mkString("\n").getBytes)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val (good, bad) = TableIO.readJsonQuarantine(spark, dir, schema)
    assert(good.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    val quarantined = bad.collect().map(_.getString(0))
    assert(quarantined.length == 1 && quarantined.head.contains("broken"))
  }
}
