package graft.io

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class AvroIOSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.session
  import spark.implicits._

  test("lineitem round-trip is schema- and value-lossless (long/int/double/string/timestamp)") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val dir = Files.createTempDirectory("graft_avro_li").toString
    AvroIO.writeAvro(li, dir)
    val back = AvroIO.readAvro(spark, dir)
    assert(back.schema == li.schema) // embedded Spark schema wins, exact types
    assert(back.count() == li.count())
    assert(back.except(li).isEmpty && li.except(back).isEmpty)
  }

  test("nested struct/array/map/decimal/date/binary/null round-trip") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("flags", ArrayType(IntegerType, containsNull = true), nullable = true),
      StructField("attrs", MapType(StringType, StringType, valueContainsNull = true), nullable = true),
      StructField("pt", StructType(Seq(
        StructField("x", DoubleType, nullable = false),
        StructField("y", DoubleType, nullable = true))), nullable = true),
      StructField("amount", DecimalType(12, 2), nullable = true),
      StructField("day", DateType, nullable = true),
      StructField("blob", BinaryType, nullable = true)))
    val rows = Seq(
      Row(1L, "a", Seq(1, null, 3), Map("k" -> "v", "n" -> null), Row(1.5, 2.5),
        new java.math.BigDecimal("12345.67"), java.sql.Date.valueOf("2024-02-29"), Array[Byte](1, 2, 3)),
      Row(2L, null, null, null, null, null, null, null),
      Row(3L, "c", Seq.empty[Integer], Map.empty[String, String], Row(0.0, null),
        new java.math.BigDecimal("-0.01"), java.sql.Date.valueOf("1969-12-31"), Array.empty[Byte]))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val dir = Files.createTempDirectory("graft_avro_nested").toString
    AvroIO.writeAvro(df, dir)
    val back = AvroIO.readAvro(spark, dir)
    assert(back.schema == schema)
    // EXCEPT can't compare MAP columns — canonicalize to sorted entry arrays
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.withColumn("attrs", array_sort(map_entries(col("attrs"))))
    assert(canon(back).except(canon(df)).isEmpty && canon(df).except(canon(back)).isEmpty)
  }

  test("one container file per input partition; overwrite replaces prior output") {
    val df = spark.range(0, 1000).repartition(7).withColumn("v", col("id") * 2)
    val dir = Files.createTempDirectory("graft_avro_parts").toString
    AvroIO.writeAvro(df.toDF(), dir)
    val files1 = TableIO.listDataFiles(spark, dir).filter(_.endsWith(".avro"))
    assert(files1.size == 7) // write parallelism preserved on disk...
    assert(AvroIO.readAvro(spark, dir).rdd.getNumPartitions == 7) // ...and on read
    // overwrite with fewer partitions: no stale files survive
    AvroIO.writeAvro(df.coalesce(2).toDF(), dir)
    val files2 = TableIO.listDataFiles(spark, dir).filter(_.endsWith(".avro"))
    assert(files2.size == 2)
    assert(AvroIO.readAvro(spark, dir).count() == 1000)
    assert(!TableIO.listDataFiles(spark, dir).exists(_.contains("_staging"))) // staging cleaned
  }

  test("timestamp round-trip keeps microsecond precision") {
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-06-15 12:34:56.123456")),
      (2L, java.sql.Timestamp.valueOf("1970-01-01 00:00:00.000001"))).toDF("id", "ts")
    val dir = Files.createTempDirectory("graft_avro_ts").toString
    AvroIO.writeAvro(df, dir)
    val back = AvroIO.readAvro(spark, dir).orderBy("id").collect()
    assert(back(0).getTimestamp(1) == java.sql.Timestamp.valueOf("2024-06-15 12:34:56.123456"))
    assert(back(1).getTimestamp(1) == java.sql.Timestamp.valueOf("1970-01-01 00:00:00.000001"))
  }

  test("column-pruned read decodes only the projected fields") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val dir = Files.createTempDirectory("graft_avro_prune").toString
    AvroIO.writeAvro(li, dir)
    val pruned = AvroIO.readAvro(spark, dir, columns = Seq("l_orderkey", "l_quantity"))
    assert(pruned.schema.fieldNames.toSeq == Seq("l_orderkey", "l_quantity"))
    // values identical to a post-read projection of the full frame
    val full = AvroIO.readAvro(spark, dir).select("l_orderkey", "l_quantity")
    assert(pruned.except(full).isEmpty && full.except(pruned).isEmpty)
    // asking for an unknown column fails loudly, not silently
    intercept[IllegalArgumentException] {
      AvroIO.readAvro(spark, dir, columns = Seq("nope"))
    }
  }

  test("foreign files without embedded Spark schema decode via the Avro mapping (enum/fixed/millis)") {
    import org.apache.avro.{Schema => ASchema, SchemaBuilder}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    // a genuinely foreign file: raw Avro API, NO graft.sparkSchema meta,
    // with types our writer never emits (enum, fixed, timestamp-millis)
    val aSchema = SchemaBuilder.record("ext_rec").namespace("ext.ns").fields()
      .requiredLong("id")
      .name("color").`type`(ASchema.createEnum("Color", null, "ext.ns",
        java.util.Arrays.asList("RED", "BLUE"))).noDefault()
      .name("tag").`type`(ASchema.createFixed("Tag4", null, "ext.ns", 4)).noDefault()
      .name("ev_ms").`type`(org.apache.avro.LogicalTypes.timestampMillis()
        .addToSchema(ASchema.create(ASchema.Type.LONG))).noDefault()
      .endRecord()
    val dir = Files.createTempDirectory("graft_avro_foreign").toString
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](aSchema))
    w.create(aSchema, new java.io.File(s"$dir/ext.avro"))
    Seq((1L, "RED", Array[Byte](1, 2, 3, 4), 1718452800000L),
        (2L, "BLUE", Array[Byte](9, 8, 7, 6), 0L)).foreach { case (id, c, t, ms) =>
      val r = new GenericData.Record(aSchema)
      r.put("id", id)
      r.put("color", new GenericData.EnumSymbol(aSchema.getField("color").schema(), c))
      r.put("tag", new GenericData.Fixed(aSchema.getField("tag").schema(), t))
      r.put("ev_ms", ms)
      w.append(r)
    }
    w.close()
    val back = AvroIO.readAvro(spark, dir)
    // enum -> string, fixed -> binary, timestamp-millis -> RAW LONG (not
    // TimestampType — the decode path reads timestamp longs as micros)
    assert(back.schema == StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("color", StringType, nullable = false),
      StructField("tag", BinaryType, nullable = false),
      StructField("ev_ms", LongType, nullable = false))))
    val rows = back.orderBy("id").collect()
    assert(rows(0).getString(1) == "RED" && rows(1).getString(1) == "BLUE")
    assert(rows(0).getAs[Array[Byte]](2).toSeq == Seq[Byte](1, 2, 3, 4))
    assert(rows(0).getLong(3) == 1718452800000L) // millis preserved verbatim
  }
}
