package graft.queries

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Fixture-drift tripwire for EVERY table, generalizing the events-ts
  * lesson (a silent physical-type change broke 16 queries for two
  * rounds): if the driver regenerates `/root/testdata` with a different
  * schema, this fails `sbt test` by NAME instead of scattering
  * AnalysisExceptions across the query surface. Column TYPES are pinned
  * where queries depend on them; columns where drift is known and
  * normalized (events.ts) accept their normalizer's input set. */
class FixtureSchemaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.session

  private def schemaOf(table: String): Map[String, DataType] =
    spark.read.parquet(s"${SparkTestBase.sf0001}/$table.parquet")
      .schema.fields.map(f => f.name -> f.dataType).toMap

  private val expected: Map[String, Map[String, DataType]] = Map(
    "region" -> Map("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Map("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Map("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Map("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Map("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Map("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderpriority" -> StringType), // o_orderdate: timestamp family, below
    "lineitem" -> Map("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType),
    "events" -> Map("event_id" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType),
    "documents" -> Map("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Map("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  private val timestampFamily: Set[DataType] =
    Set(TimestampType, TimestampNTZType, LongType) // long = NANOS under legacy conf

  test("every fixture table carries the schema the query surface assumes") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val drifted = expected.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val got = schemaOf(table)
      val missing = cols.keySet.diff(got.keySet)
        .map(c => s"$table.$c MISSING")
      val changed = cols.collect {
        case (c, t) if got.contains(c) && got(c) != t =>
          s"$table.$c is ${got(c)} (expected $t)"
      }
      missing ++ changed
    }
    assert(drifted.isEmpty,
      s"fixture drift — update the readers/normalizers AND this spec:\n  ${drifted.mkString("\n  ")}")
  }

  test("time columns stay within their normalizers' accepted encodings") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val eventsTs = schemaOf("events")("ts")
    assert(timestampFamily.contains(eventsTs),
      s"events.ts drifted to $eventsTs — QueryUtil.normalizeTs cannot read it")
    val orderDate = schemaOf("orders")("o_orderdate")
    assert(timestampFamily.contains(orderDate) || orderDate == DateType,
      s"orders.o_orderdate drifted to $orderDate")
    val shipDate = schemaOf("lineitem")("l_shipdate")
    assert(timestampFamily.contains(shipDate) || shipDate == DateType,
      s"lineitem.l_shipdate drifted to $shipDate")
  }
}
