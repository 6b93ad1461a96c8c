package graft.props

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{array_sort, col, map_entries}
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.SparkTestBase
import graft.io.AvroIO

/** Property-based coverage for the Avro sink/source (SURVEY §5.2): any
  * generated batch of rows over a type-rich schema must round-trip
  * value- and schema-losslessly, at any partitioning. Spark jobs per
  * trial → a handful of generated batches suffices. */
object AvroProps extends Properties("avro") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SparkTestBase.session

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("s", StringType, nullable = true),
    StructField("d", DoubleType, nullable = true),
    StructField("f", FloatType, nullable = true),
    StructField("b", BooleanType, nullable = true),
    StructField("bin", BinaryType, nullable = true),
    StructField("day", DateType, nullable = true),
    StructField("ts", TimestampType, nullable = true),
    StructField("arr", ArrayType(LongType, containsNull = true), nullable = true),
    StructField("m", MapType(StringType, LongType, valueContainsNull = true), nullable = true),
    StructField("st", StructType(Seq(
      StructField("x", DoubleType, nullable = true),
      StructField("y", StringType, nullable = true))), nullable = true)))

  // Unicode-ish strings, extreme numerics, null-heavy optionals
  private val strGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(12)),
    Gen.const(""),
    Gen.const("héllo wörld ☃"),
    Gen.const("line\nbreak\ttab"))
  private def opt[T](g: Gen[T]): Gen[Option[T]] = Gen.option(g)
  private val doubleGen = Gen.oneOf(
    Gen.choose(-1e9, 1e9), Gen.const(0.0), Gen.const(-0.0),
    Gen.const(Double.MaxValue), Gen.const(Double.MinPositiveValue))

  private val rowGen: Gen[Row] = for {
    id <- Gen.choose(Long.MinValue / 2, Long.MaxValue / 2)
    s <- opt(strGen)
    d <- opt(doubleGen)
    f <- opt(Gen.choose(-1e6f, 1e6f))
    b <- opt(Gen.oneOf(true, false))
    bin <- opt(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))
    day <- opt(Gen.choose(-30000L, 30000L).map(e => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(e))))
    ts <- opt(Gen.choose(0L, 4102444800000000L).map { micros =>
      val t = new java.sql.Timestamp(micros / 1000L)
      t.setNanos(((micros % 1000000L) * 1000L).toInt); t
    })
    arr <- opt(Gen.listOf(opt(Gen.choose(-100L, 100L)).map(_.map(Long.box).orNull)))
    m <- opt(Gen.mapOf(Gen.zip(strGen.map(_.take(6)), opt(Gen.choose(-9L, 9L)).map(_.map(Long.box).orNull))))
    x <- opt(doubleGen)
    y <- opt(strGen)
    hasSt <- Gen.oneOf(true, false)
  } yield Row(id, s.orNull, d.map(Double.box).orNull, f.map(Float.box).orNull,
    b.map(Boolean.box).orNull, bin.orNull, day.orNull, ts.orNull,
    arr.map(_.toSeq).orNull, m.orNull,
    if (hasSt) Row(x.map(Double.box).orNull, y.orNull) else null)

  private def canon(d: org.apache.spark.sql.DataFrame) =
    d.withColumn("m", array_sort(map_entries(col("m"))))

  property("round-trip is schema- and value-lossless at any partitioning") =
    forAll(Gen.listOf(rowGen), Gen.choose(1, 5)) { (rows, parts) =>
      rows.isEmpty || {
        // distinct ids: EXCEPT-based comparison needs set semantics
        val uniq = rows.zipWithIndex.map { case (r, i) =>
          Row.fromSeq(i.toLong +: r.toSeq.tail) }
        val df = spark.createDataFrame(
          spark.sparkContext.parallelize(uniq, parts), schema)
        val dir = Files.createTempDirectory("avro_props").toString
        AvroIO.writeAvro(df, dir)
        val back = AvroIO.readAvro(spark, dir)
        back.schema == schema &&
          back.count() == uniq.length &&
          canon(back).except(canon(df)).isEmpty &&
          canon(df).except(canon(back)).isEmpty
      }
    }
}
