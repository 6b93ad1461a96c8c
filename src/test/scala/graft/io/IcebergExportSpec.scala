package graft.io

import scala.jdk.CollectionConverters._

import org.apache.avro.file.DataFileStream
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.json4s._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/**
 * The Iceberg v2 export, proven by an INDEPENDENT raw parse of the
 * metadata tree (json4s for the metadata JSON, a bare Avro
 * GenericDatumReader for manifest list + manifest — not the exporter's
 * own reader) plus the reader API, across write → append → overwrite.
 */
class IcebergExportSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.session
  import spark.implicits._

  private def tmpDir() =
    java.nio.file.Files.createTempDirectory("iceberg").toString

  private def rawAvro(path: String): Seq[GenericRecord] = {
    val in = new java.io.FileInputStream(path.stripPrefix("file:"))
    val r = new DataFileStream[GenericRecord](in,
      new GenericDatumReader[GenericRecord]())
    try r.iterator().asScala.toVector finally r.close()
  }

  private def threeCommitTable(): String = {
    val dir = tmpDir()
    Manifest.write((1 to 100).toDF("v"), dir, "s1")
    Manifest.append((101 to 130).toDF("v"), dir, "s2")
    Manifest.write((1 to 40).toDF("v"), dir, "s3")
    dir
  }

  test("metadata JSON carries the required v2 fields and a field-id'd schema") {
    val dir = threeCommitTable()
    assert(IcebergExport.exportTable(spark, dir) == 1)
    assert(new java.io.File(s"$dir/metadata/version-hint.text").exists())
    assert(scala.io.Source.fromFile(
      s"$dir/metadata/version-hint.text").mkString.trim == "1")

    val meta = IcebergExport.currentMetadata(spark, dir)
    assert(meta \ "format-version" == JInt(2))
    assert(meta \ "last-sequence-number" == JInt(2))
    assert(meta \ "current-snapshot-id" == JInt(2))
    assert(meta \ "refs" \ "main" \ "snapshot-id" == JInt(2))
    val JString(uuid) = meta \ "table-uuid"
    assert(java.util.UUID.fromString(uuid) != null)
    // schema: one long field with id 1; last-column-id agrees
    val JArray(schemas) = meta \ "schemas"
    val JArray(fields) = schemas.head \ "fields"
    assert(fields.map(f => (f \ "name", f \ "id", f \ "type")) ==
      List((JString("v"), JInt(1), JString("int"))))
    assert(meta \ "last-column-id" == JInt(1))
    // three snapshots with sequence-number = commit_seq, op classified
    val JArray(snaps) = meta \ "snapshots"
    assert(snaps.map(s => s \ "snapshot-id") == List(JInt(0), JInt(1), JInt(2)))
    assert(snaps.map(s => s \ "summary" \ "operation") ==
      List(JString("append"), JString("append"), JString("overwrite")))
  }

  test("manifest list and manifest carry spec field-ids, statuses, and real counts") {
    val dir = threeCommitTable()
    IcebergExport.exportTable(spark, dir)
    val meta = IcebergExport.currentMetadata(spark, dir)
    val JArray(snaps) = meta \ "snapshots"

    // raw-parse snapshot 1 (the append): carried s1 files EXISTING,
    // new s2 files ADDED, sequence numbers pin the introducing commit
    val JString(list1) = snaps(1) \ "manifest-list"
    val mfs = rawAvro(list1)
    assert(mfs.size == 1)
    val mf = mfs.head
    // Avro schema carries the Iceberg field-ids
    assert(mf.getSchema.getField("manifest_path").getObjectProp("field-id") == 500)
    assert(mf.get("content") == 0 && mf.get("partition_spec_id") == 0)
    assert(mf.get("sequence_number").toString.toLong == 1)
    assert(mf.get("min_sequence_number").toString.toLong == 0)

    val entries = rawAvro(mf.get("manifest_path").toString)
    assert(entries.nonEmpty)
    assert(entries.head.getSchema.getField("status").getObjectProp("field-id") == 0)
    val df0 = entries.head.get("data_file").asInstanceOf[GenericRecord]
    assert(df0.getSchema.getField("file_path").getObjectProp("field-id") == 100)
    val byStatus = entries.groupBy(_.get("status"))
    assert(byStatus.keySet == Set(0, 1)) // EXISTING s1 files + ADDED s2 files
    byStatus(0).foreach { e => // carried forward: introduced at seq 0
      assert(e.get("sequence_number").toString.toLong == 0)
      assert(e.get("data_file").asInstanceOf[GenericRecord]
        .get("file_path").toString.contains("data-s1/"))
    }
    byStatus(1).foreach { e =>
      assert(e.get("sequence_number").toString.toLong == 1)
      assert(e.get("data_file").asInstanceOf[GenericRecord]
        .get("file_path").toString.contains("data-s2/"))
    }
    // counts in the manifest list agree with the entries
    assert(mf.get("added_files_count") == byStatus(1).size)
    assert(mf.get("existing_files_count") == byStatus(0).size)
    // record_count is the real parquet row count: totals 130 across s1+s2
    val totalRows = entries.map(_.get("data_file").asInstanceOf[GenericRecord]
      .get("record_count").toString.toLong).sum
    assert(totalRows == 130)
    assert(mf.get("added_rows_count").toString.toLong +
      mf.get("existing_rows_count").toString.toLong == 130)
  }

  test("reader reconstruction equals the Manifest view; time travel works") {
    val dir = threeCommitTable()
    IcebergExport.exportTable(spark, dir)
    assert(IcebergExport.read(spark, dir).as[Int].collect().sorted.toSeq ==
      (1 to 40))
    assert(IcebergExport.readSnapshot(spark, dir, 1L)
      .as[Int].collect().sorted.toSeq == (1 to 130))
    assert(IcebergExport.readSnapshot(spark, dir, 0L)
      .as[Int].collect().sorted.toSeq == (1 to 100))
    // file sets match the manifest history exactly
    val hist = Manifest.history(spark, dir)
    (0 to 2).foreach { s =>
      assert(IcebergExport.activeFiles(spark, dir, Some(s.toLong))
        .map(_.split('/').takeRight(2).mkString("/")).sorted ==
        hist(s).files.sorted)
    }
  }

  test("re-export is incremental: avro files immutable, metadata generation advances") {
    val dir = tmpDir()
    Manifest.write((1 to 10).toDF("v"), dir, "s1")
    assert(IcebergExport.exportTable(spark, dir) == 1)
    val snap0 = new java.io.File(s"$dir/metadata/snap-0.avro")
    val before = snap0.lastModified()
    Manifest.append((11 to 15).toDF("v"), dir, "s2")
    assert(IcebergExport.exportTable(spark, dir) == 2)
    assert(snap0.lastModified() == before, "snapshot avro must not be rewritten")
    assert(new java.io.File(s"$dir/metadata/v1.metadata.json").exists())
    assert(new java.io.File(s"$dir/metadata/v2.metadata.json").exists())
    assert(IcebergExport.read(spark, dir).count() == 15)
  }

  test("vacuum then export expires dropped snapshots' avro and old metadata generations") {
    val dir = threeCommitTable()
    IcebergExport.exportTable(spark, dir)
    Manifest.vacuum(spark, dir, keepLast = 1)
    assert(IcebergExport.exportTable(spark, dir) == 2)
    val names = new java.io.File(s"$dir/metadata").listFiles().map(_.getName).toSet
    // dropped snapshots' per-snapshot avro files are gone, current kept
    assert(!names.contains("snap-0.avro") && !names.contains("snap-1.avro"))
    assert(!names.contains("seq-0-m0.avro") && !names.contains("seq-1-m0.avro"))
    assert(names.contains("snap-2.avro") && names.contains("seq-2-m0.avro"))
    // HadoopTables retention: current + previous metadata generations
    assert(names.contains("v1.metadata.json") && names.contains("v2.metadata.json"))
    import spark.implicits._
    assert(IcebergExport.read(spark, dir).as[Int].collect().sorted.toSeq == (1 to 40))
    // one more commit+export: the v1 generation ages out
    Manifest.append((200 to 205).toDF("v"), dir, "s4")
    assert(IcebergExport.exportTable(spark, dir) == 3)
    val names2 = new java.io.File(s"$dir/metadata").listFiles().map(_.getName).toSet
    assert(!names2.contains("v1.metadata.json"))
    assert(names2.contains("v2.metadata.json") && names2.contains("v3.metadata.json"))
    assert(IcebergExport.read(spark, dir).count() == 46)
  }

  test("array columns export as list types with element ids") {
    val dir = tmpDir()
    Manifest.write(Seq((1L, Seq(1.0f, 2.0f))).toDF("id", "vec"), dir, "s1")
    IcebergExport.exportTable(spark, dir)
    val meta = IcebergExport.currentMetadata(spark, dir)
    val JArray(schemas) = meta \ "schemas"
    val JArray(fields) = schemas.head \ "fields"
    assert(fields.map(f => f \ "name") == List(JString("id"), JString("vec")))
    val vecType = fields(1) \ "type"
    assert(vecType \ "type" == JString("list"))
    assert(vecType \ "element" == JString("float"))
    val ids = fields.map(f => f \ "id") :+ (vecType \ "element-id")
    assert(ids.collect { case JInt(i) => i }.distinct.size == ids.size,
      "field ids must be unique")
  }
}
