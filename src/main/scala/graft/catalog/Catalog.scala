package graft.catalog

import org.apache.spark.sql.SparkSession

import graft.meta.{DatabaseMeta, TableMeta}

/**
 * Catalog/DDL operations: drop/create database, create external tables
 * from metadata, partition repair — the native-Spark equivalent of the
 * reference's Glue-catalog deploy (reference create_database_schema.py:4-8;
 * README.md:424-440; SURVEY.md §2.1 O20-O21). Schema-on-read: catalog ops
 * never touch data — dropping the database does not delete files
 * (README.md:434), tables are EXTERNAL with explicit LOCATIONs.
 */
object Catalog {

  private def ident(s: String): String = s"`${s.replace("`", "``")}`"

  /** DROP + CREATE the database from a metadata folder — full catalog
    * redeploy, idempotent (reference create_database_schema.py:4-7). */
  def deployDatabase(spark: SparkSession, db: DatabaseMeta, tables: Seq[TableMeta]): Unit = {
    dropDatabase(spark, db.name)
    spark.sql(s"CREATE DATABASE ${ident(db.name)}")
    tables.foreach(t => createTable(spark, db, t))
  }

  def dropDatabase(spark: SparkSession, name: String): Unit =
    spark.sql(s"DROP DATABASE IF EXISTS ${ident(name)} CASCADE")

  /** CREATE TABLE ... USING <format> PARTITIONED BY ... LOCATION ... from
    * the metadata schema (reference README.md:424-434). */
  def createTable(spark: SparkSession, db: DatabaseMeta, t: TableMeta): Unit = {
    val colsDdl = t.columns
      .map(c => s"${ident(c.name)} ${c.sparkType.sql}")
      .mkString(", ")
    val partDdl =
      if (t.partitions.isEmpty) ""
      else t.partitions.map(ident).mkString(" PARTITIONED BY (", ", ", ")")
    spark.sql(
      s"""CREATE TABLE ${ident(db.name)}.${ident(t.name)} ($colsDdl)
         |USING ${t.dataFormat}$partDdl
         |LOCATION '${db.tablePath(t)}'""".stripMargin)
  }

  /** Register discovered partitions — `MSCK REPAIR TABLE` per table
    * (reference create_database_schema.py:8 ≡ README.md:436). Partitioned
    * tables read empty until this runs. */
  def repairTable(spark: SparkSession, dbName: String, tableName: String): Unit =
    spark.sql(s"MSCK REPAIR TABLE ${ident(dbName)}.${ident(tableName)}")

  def repairAllTablePartitions(spark: SparkSession, db: DatabaseMeta, tables: Seq[TableMeta]): Unit =
    tables.filter(_.partitions.nonEmpty).foreach(t => repairTable(spark, db.name, t.name))

  /** Incremental alternative to full MSCK — cheaper with many partitions
    * (reference README.md:440). */
  def addPartition(
      spark: SparkSession,
      dbName: String,
      tableName: String,
      spec: Map[String, String],
      location: Option[String] = None): Unit = {
    val specDdl = spec.map { case (k, v) => s"${ident(k)}='${v.replace("'", "''")}'" }.mkString(", ")
    val locDdl = location.map(l => s" LOCATION '$l'").getOrElse("")
    spark.sql(s"ALTER TABLE ${ident(dbName)}.${ident(tableName)} ADD IF NOT EXISTS PARTITION ($specDdl)$locDdl")
  }
}
