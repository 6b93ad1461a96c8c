package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.io.AvroIO

class AvroSourceV2Spec extends AnyFunSuite {
  lazy val spark = SparkTestBase.session

  private def writeFixture(): String = {
    val dir = Files.createTempDirectory("avro_v2").toString
    AvroIO.writeAvro(
      spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet"), dir)
    dir
  }

  test("format(...).load reads AvroIO output with the exact Spark schema") {
    val dir = writeFixture()
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val v2 = spark.read.format("graft.sources.AvroSourceV2").load(dir)
    assert(v2.schema == li.schema)
    assert(v2.count() == li.count())
    assert(v2.except(li).isEmpty && li.except(v2).isEmpty)
  }

  test("column pruning pushes into the Avro decoder (ReadSchema shrinks)") {
    val dir = writeFixture()
    val pruned = spark.read.format("graft.sources.AvroSourceV2").load(dir)
      .select("l_orderkey", "l_quantity")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: l_orderkey,l_quantity"),
      s"scan description missing pruned ReadSchema:\n$plan")
    // and the pruned read returns the same values as a post-read projection
    val full = spark.read.format("graft.sources.AvroSourceV2").load(dir)
      .select("l_orderkey", "l_quantity")
    assert(pruned.except(full).isEmpty)
    assert(pruned.count() == spark.read.parquet(
      "/root/testdata/sf0.001/lineitem.parquet").count())
  }

  test("v2 write: df.write.format(...) round-trips through the V2 commit protocol") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val dir = Files.createTempDirectory("avro_v2_write").toString + "/t"
    li.repartition(3).write.format("graft.sources.AvroSourceV2")
      .mode("append").save(dir)
    val back = spark.read.format("graft.sources.AvroSourceV2").load(dir)
    assert(back.schema == li.schema)
    assert(back.count() == li.count())
    assert(back.except(li).isEmpty && li.except(back).isEmpty)
    // one committed file per partition, no staging leftovers
    val files = new java.io.File(dir).listFiles().map(_.getName)
    assert(files.count(_.endsWith(".avro")) == 3)
    assert(!files.exists(_.startsWith("_staging")))
  }

  test("v2 write: overwrite truncates prior output at job commit") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val dir = Files.createTempDirectory("avro_v2_ow").toString + "/t"
    li.write.format("graft.sources.AvroSourceV2").mode("append").save(dir)
    val first = spark.read.format("graft.sources.AvroSourceV2").load(dir).count()
    assert(first == li.count())
    li.limit(100).coalesce(1).write.format("graft.sources.AvroSourceV2")
      .mode("overwrite").save(dir)
    assert(spark.read.format("graft.sources.AvroSourceV2").load(dir).count() == 100)
    // append mode accumulates instead
    li.limit(50).coalesce(1).write.format("graft.sources.AvroSourceV2")
      .mode("append").save(dir)
    assert(spark.read.format("graft.sources.AvroSourceV2").load(dir).count() == 150)
  }

  test("micro-batch face: an Avro land zone streams exactly-once across drains") {
    import org.apache.spark.sql.streaming.Trigger
    val base = Files.createTempDirectory("avro_v2_stream")
    val land = base.resolve("land").toString
    val out = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString

    def drain(): Unit = {
      val q = spark.readStream.format("graft.sources.AvroSourceV2")
        .schema(spark.range(0).withColumn("v", org.apache.spark.sql.functions.lit(0L)).select("id", "v").schema)
        .load(land)
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", out).outputMode("append").start()
      q.awaitTermination()
    }

    import spark.implicits._
    AvroIO.writeAvro((0L until 100L).map(i => (i, i * 2)).toDF("id", "v"), s"$land/b1")
    drain()
    assert(spark.read.parquet(out).count() == 100)

    // second batch of files; a NEW query from the same checkpoint reads
    // only the delta (offset = consumed-file list, replayed on restart)
    AvroIO.writeAvro((100L until 150L).map(i => (i, i * 2)).toDF("id", "v"), s"$land/b2")
    drain()
    val all = spark.read.parquet(out)
    assert(all.count() == 150)
    assert(all.select("id").distinct().count() == 150) // no re-reads

    // nothing new: drain emits nothing
    drain()
    assert(spark.read.parquet(out).count() == 150)
  }

  test("COUNT(*) is answered from block headers: count-pushdown scan, exact result") {
    val dir = writeFixture()
    // append a second job's files so the partial counts genuinely sum
    // across containers from different writes
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").limit(100)
      .write.format("graft.sources.AvroSourceV2").mode("append").save(dir)
    val df = spark.read.format("graft.sources.AvroSourceV2").load(dir)
    val counted = df.groupBy().count()
    val plan = counted.queryExecution.executedPlan.toString
    assert(plan.contains("count-pushdown(block-headers)"),
      s"expected the count-pushdown scan in the plan:\n$plan")
    val truth = spark.read.parquet(
      "/root/testdata/sf0.001/lineitem.parquet").count() + 100
    assert(counted.collect().head.getLong(0) == truth)
    // spark.sql COUNT(*) takes the same path
    df.createOrReplaceTempView("li_cnt")
    assert(spark.sql("SELECT COUNT(*) FROM li_cnt").collect().head.getLong(0) == truth)
    // grouped / non-CountStar aggregates DECLINE the pushdown and decode
    val grouped = df.groupBy("l_returnflag").count()
    assert(!grouped.queryExecution.executedPlan.toString
      .contains("count-pushdown"))
    assert(grouped.agg(org.apache.spark.sql.functions.sum("count"))
      .collect().head.getLong(0) == truth)
  }

  test("SQL over the v2 source: aggregate matches parquet truth") {
    val dir = writeFixture()
    spark.read.format("graft.sources.AvroSourceV2").load(dir)
      .createOrReplaceTempView("li_avro")
    val got = spark.sql(
      "SELECT l_returnflag, COUNT(*) AS n FROM li_avro GROUP BY 1 ORDER BY 1")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .groupBy("l_returnflag").count().orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want)
  }
}
