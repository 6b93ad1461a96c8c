package graft.meta

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class MetaSpec extends AnyFunSuite {

  val tableJson =
    """{
      |  "name": "calculated",
      |  "description": "derived counts",
      |  "data_format": "parquet",
      |  "location": "calculated",
      |  "columns": [
      |    {"name": "european_electoral_region", "type": "character", "description": "region"},
      |    {"name": "n", "type": "int", "description": "count"},
      |    {"name": "dea_version", "type": "character", "description": "tag"},
      |    {"name": "dea_snapshot_date", "type": "date", "description": "run date"}
      |  ],
      |  "partitions": ["dea_snapshot_date"]
      |}""".stripMargin

  test("parseTable maps agnostic types to Spark types (SURVEY §1.3)") {
    val t = Meta.parseTable(tableJson)
    assert(t.name == "calculated")
    assert(t.dataFormat == "parquet")
    assert(t.partitions == Seq("dea_snapshot_date"))
    assert(t.schema == StructType(Seq(
      StructField("european_electoral_region", StringType),
      StructField("n", IntegerType),
      StructField("dea_version", StringType),
      StructField("dea_snapshot_date", DateType))))
    // partition columns are excluded from data files (reference job.py:67)
    assert(t.dataColumns.map(_.name) == Seq("european_electoral_region", "n", "dea_version"))
  }

  test("type mapping covers the full agnostic surface") {
    assert(MetaTypes.toSpark("character") == StringType)
    assert(MetaTypes.toSpark("int") == IntegerType)
    assert(MetaTypes.toSpark("long") == LongType)
    assert(MetaTypes.toSpark("double") == DoubleType)
    assert(MetaTypes.toSpark("date") == DateType)
    assert(MetaTypes.toSpark("datetime") == TimestampType)
    assert(MetaTypes.toSpark("boolean") == BooleanType)
    assert(MetaTypes.toSpark("binary") == BinaryType)
    assert(MetaTypes.toSpark("decimal(18,2)") == DecimalType(18, 2))
    assertThrows[IllegalArgumentException](MetaTypes.toSpark("wibble"))
  }

  test("round-trip: render then re-parse preserves the table") {
    val t = Meta.parseTable(tableJson)
    assert(Meta.parseTable(Meta.renderTable(t)) == t)
  }

  test("parseDatabase reads the database descriptor (reference database.json)") {
    val db = Meta.parseDatabase(
      """{"name": "example_db", "bucket": "/tmp/zone", "base_folder": "database"}""")
    assert(db.name == "example_db")
    assert(db.basePath == "/tmp/zone/database")
  }
}
