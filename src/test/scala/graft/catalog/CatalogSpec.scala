package graft.catalog

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.meta.{ColumnMeta, DatabaseMeta, TableMeta}

class CatalogSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.session
  import spark.implicits._

  test("deploy database + external tables; partitioned table empty until repair (O20-O21)") {
    val base = Files.createTempDirectory("graft_catalog").toString
    val db = DatabaseMeta("graft_cat_test", base, "database")
    val plain = TableMeta("plain", "parquet", Seq(
      ColumnMeta("id", "int"), ColumnMeta("v", "character")))
    val parted = TableMeta("parted", "parquet", Seq(
      ColumnMeta("id", "int"), ColumnMeta("dt", "character")),
      partitions = Seq("dt"))

    // data written *before* catalog exists — schema-on-read
    Seq((1, "a"), (2, "b")).toDF("id", "v")
      .write.mode("overwrite").parquet(db.tablePath(plain))
    Seq(Tuple1(10)).toDF("id")
      .write.mode("overwrite").parquet(s"${db.tablePath(parted)}/dt=2026-01-01")

    Catalog.deployDatabase(spark, db, Seq(plain, parted))
    assert(spark.sql("SELECT COUNT(*) FROM graft_cat_test.plain").collect().head.getLong(0) == 2)
    // partitioned table reads empty until MSCK registers partitions (README.md:436)
    assert(spark.sql("SELECT COUNT(*) FROM graft_cat_test.parted").collect().head.getLong(0) == 0)
    Catalog.repairTable(spark, "graft_cat_test", "parted")
    val rows = spark.sql("SELECT id, dt FROM graft_cat_test.parted").collect()
    assert(rows.length == 1 && rows.head.getString(1) == "2026-01-01")

    // drop is catalog-only: data files survive (README.md:434)
    Catalog.dropDatabase(spark, "graft_cat_test")
    assert(spark.read.parquet(db.tablePath(plain)).count() == 2)
  }

  test("addPartition registers a single partition incrementally") {
    val base = Files.createTempDirectory("graft_addpart").toString
    val db = DatabaseMeta("graft_addpart_db", base, "database")
    val t = TableMeta("t", "parquet",
      Seq(ColumnMeta("id", "int"), ColumnMeta("dt", "character")),
      partitions = Seq("dt"))
    Seq(Tuple1(1)).toDF("id").write.parquet(s"${db.tablePath(t)}/dt=d1")
    Catalog.deployDatabase(spark, db, Seq(t))
    Catalog.addPartition(spark, db.name, "t", Map("dt" -> "d1"))
    assert(spark.sql(s"SELECT COUNT(*) FROM ${db.name}.t").collect().head.getLong(0) == 1)
    Catalog.dropDatabase(spark, db.name)
  }
}
