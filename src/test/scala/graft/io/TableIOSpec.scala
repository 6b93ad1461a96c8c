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

  test("csv round-trips with declared schema, header, custom delimiter") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_csv").toString + "/t"
    val df = Seq((1L, "a|x", 1.5), (2L, "b", -0.25)).toDF("id", "s", "v")
    TableIO.writeCsv(df, dir, header = true, delimiter = ";")
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("s", StringType), StructField("v", DoubleType)))
    val back = TableIO.readCsv(spark, dir, schema, header = true, delimiter = ";")
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("orc round-trips") {
    val dir = Files.createTempDirectory("graft_orc").toString + "/t"
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    TableIO.writeOrc(df, dir)
    assert(TableIO.readOrc(spark, dir).orderBy("id").collect().toSeq ==
      df.orderBy("id").collect().toSeq)
  }

  test("writeIntoPartition routes metadata format 'avro' through the engine's DSv2 face") {
    val base = Files.createTempDirectory("graft_avro_meta").toString
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    TableIO.writeIntoPartition(df, s"$base/t", "snap", "2024-01-01", format = "avro")
    val back = spark.read.format("graft.sources.AvroSourceV2")
      .load(s"$base/t/snap=2024-01-01")
    assert(back.as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
    // metadata-declared overwrite semantics hold for the routed format too
    TableIO.writeIntoPartition(df.limit(1), s"$base/t", "snap", "2024-01-01", format = "avro")
    assert(spark.read.format("graft.sources.AvroSourceV2")
      .load(s"$base/t/snap=2024-01-01").count() == 1)
  }

  test("compactDir shrinks a many-tiny-files zone without changing its rows") {
    val dir = Files.createTempDirectory("graft_compact").toString + "/t"
    val df = (1 to 1000).map(i => (i.toLong, s"row$i")).toDF("id", "s")
    df.repartition(50).write.parquet(dir) // 50 tiny files
    def parquetFiles = new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(parquetFiles == 50)
    val before = spark.read.parquet(dir).orderBy("id").collect().toSeq
    TableIO.compactDir(spark, dir, targetFileBytes = 1L << 30)
    assert(parquetFiles <= 2, s"still $parquetFiles files")
    assert(spark.read.parquet(dir).orderBy("id").collect().toSeq == before)
  }

  test("schema evolution: mergeSchema unions evolving partition schemas") {
    val base = Files.createTempDirectory("graft_evolve").toString + "/t"
    Seq((1L, "a")).toDF("id", "a").write.parquet(s"$base/land_ts=1")
    Seq((2L, "b", 9.5)).toDF("id", "a", "score").write.parquet(s"$base/land_ts=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(base)
    assert(merged.columns.sorted.toSeq == Seq("a", "id", "land_ts", "score"))
    val rows = merged.orderBy("id")
      .collect().map(r => (r.getAs[Long]("id"), Option(r.getAs[Any]("score"))))
    assert(rows.toSeq == Seq((1L, None), (2L, Some(9.5)))) // old rows null-fill
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
