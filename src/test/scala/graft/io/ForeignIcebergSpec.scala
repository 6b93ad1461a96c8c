package graft.io

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema => AvroSchema}
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/**
 * FOREIGN-Iceberg import: metadata trees hand-authored the way OTHER
 * v2 writers (Spark-Iceberg, Flink, pyiceberg) produce them — shuffled
 * manifest-entry Avro fields, unknown extra fields, several manifest
 * files per manifest-list, ADDED entries with NULL (inherited)
 * sequence numbers, DELETED (status=2) entries kept in rewritten
 * manifests, NO optional stats maps, arbitrary (non-graft) data
 * layouts — must read byte-identical or fail loudly naming the
 * feature. Equality deletes (content=2, the Flink CDC shape) APPLY
 * with the spec's sequence scoping and null-safe matching.
 */
class ForeignIcebergSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.session
  import spark.implicits._

  private def tmpDir() =
    java.nio.file.Files.createTempDirectory("foreigniceberg").toString

  /** Land a one-part parquet with an exact foreign-chosen file name. */
  private def landParquet(df: DataFrame, dir: String, name: String): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("fipart").toString + "/out"
    df.coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(fail(s"no part file under $tmp"))
    java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(dir, name))
  }

  private def writeAvro(path: String, schema: AvroSchema,
      recs: Seq[GenericRecord]): Unit = {
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new java.io.File(path))
    recs.foreach(w.append)
    w.close()
  }

  /** A foreign writer's manifest-entry schema: fields SHUFFLED
    * (data_file first), an unknown `custom_tag`, NO
    * file_sequence_number, NO stats maps; data_file itself shuffled and
    * carrying an unknown `spec_id` plus optional equality_ids. */
  private val foreignEntrySchema: AvroSchema = new AvroSchema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |  {"name":"file_format","type":"string"},
      |  {"name":"record_count","type":"long"},
      |  {"name":"file_path","type":"string"},
      |  {"name":"content","type":"int"},
      |  {"name":"spec_id","type":["null","int"],"default":null},
      |  {"name":"file_size_in_bytes","type":"long"},
      |  {"name":"equality_ids","type":["null",{"type":"array","items":"int"}],"default":null}
      |]}},
      |{"name":"status","type":"int"},
      |{"name":"snapshot_id","type":["null","long"],"default":null},
      |{"name":"sequence_number","type":["null","long"],"default":null},
      |{"name":"custom_tag","type":["null","string"],"default":null}
      |]}""".stripMargin)

  private val foreignListSchema: AvroSchema = new AvroSchema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string"},
      |{"name":"manifest_length","type":"long"},
      |{"name":"partition_spec_id","type":"int"},
      |{"name":"content","type":"int"},
      |{"name":"sequence_number","type":"long"},
      |{"name":"min_sequence_number","type":"long"},
      |{"name":"added_snapshot_id","type":"long"},
      |{"name":"writer_build","type":["null","string"],"default":null}
      |]}""".stripMargin)

  private def entry(status: Int, seq: Option[Long], path: String,
      content: Int, records: Long,
      eqIds: Seq[Int] = Nil): GenericRecord = {
    val df = new GenericData.Record(
      foreignEntrySchema.getField("data_file").schema())
    df.put("file_format", "PARQUET")
    df.put("record_count", java.lang.Long.valueOf(records))
    df.put("file_path", path)
    df.put("content", content)
    df.put("spec_id", 0)
    df.put("file_size_in_bytes", java.lang.Long.valueOf(10L))
    if (eqIds.nonEmpty)
      df.put("equality_ids", new GenericData.Array[Integer](
        AvroSchema.createArray(AvroSchema.create(AvroSchema.Type.INT)),
        eqIds.map(Integer.valueOf).asJava))
    val e = new GenericData.Record(foreignEntrySchema)
    e.put("data_file", df)
    e.put("status", status)
    e.put("snapshot_id", java.lang.Long.valueOf(7L))
    seq.foreach(s => e.put("sequence_number", java.lang.Long.valueOf(s)))
    e.put("custom_tag", "other-engine")
    e
  }

  private def listEntry(path: String, content: Int, seq: Long): GenericRecord = {
    val mf = new GenericData.Record(foreignListSchema)
    mf.put("manifest_path", path)
    mf.put("manifest_length", java.lang.Long.valueOf(
      new java.io.File(path.stripPrefix("file:")).length()))
    mf.put("partition_spec_id", 0)
    mf.put("content", content)
    mf.put("sequence_number", java.lang.Long.valueOf(seq))
    mf.put("min_sequence_number", java.lang.Long.valueOf(1L))
    mf.put("added_snapshot_id", java.lang.Long.valueOf(seq))
    mf.put("writer_build", "flink-1.19")
    mf
  }

  /** Minimal v2 metadata JSON + version-hint for a one-snapshot tree. */
  private def writeMetadata(dir: String, snapshotId: Long,
      listPath: String): Unit = {
    val md = new java.io.File(dir, "metadata"); md.mkdirs()
    val json =
      s"""{
         |  "format-version": 2,
         |  "table-uuid": "11111111-2222-3333-4444-555555555555",
         |  "location": "$dir",
         |  "last-sequence-number": $snapshotId,
         |  "last-updated-ms": 1700000000000,
         |  "last-column-id": 1,
         |  "current-schema-id": 0,
         |  "schemas": [{"type": "struct", "schema-id": 0, "fields": [
         |    {"id": 1, "name": "v", "required": false, "type": "int"}]}],
         |  "default-spec-id": 0,
         |  "partition-specs": [{"spec-id": 0, "fields": []}],
         |  "last-partition-id": 999,
         |  "default-sort-order-id": 0,
         |  "sort-orders": [{"order-id": 0, "fields": []}],
         |  "current-snapshot-id": $snapshotId,
         |  "snapshots": [{"snapshot-id": $snapshotId,
         |    "sequence-number": $snapshotId, "timestamp-ms": 1700000000000,
         |    "manifest-list": "$listPath",
         |    "summary": {"operation": "append"}, "schema-id": 0}],
         |  "snapshot-log": [{"timestamp-ms": 1700000000000,
         |    "snapshot-id": $snapshotId}]
         |}""".stripMargin
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/metadata/v1.metadata.json"),
      json.getBytes("UTF-8"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/metadata/version-hint.text"),
      "1".getBytes("UTF-8"))
  }

  test("foreign tree: shuffled/extra fields, two manifests per list, inherited " +
      "sequence numbers, status=2 exclusion, no stats maps") {
    val dir = tmpDir()
    landParquet((1 to 10).toDF("v"), dir, "a.parquet")
    landParquet((11 to 20).toDF("v"), dir, "b.parquet")
    landParquet((900 to 950).toDF("v"), dir, "c.parquet") // DELETED entry
    val qual = s"file:$dir"
    // manifest 1: a ADDED with NULL sequence_number (inherits 1)
    writeAvro(s"$dir/m1.avro", foreignEntrySchema,
      Seq(entry(1, None, s"$qual/a.parquet", 0, 10)))
    // manifest 2 (a rewrite): b EXISTING with explicit seq, c DELETED —
    // a state read must include b and EXCLUDE c
    writeAvro(s"$dir/m2.avro", foreignEntrySchema, Seq(
      entry(0, Some(2L), s"$qual/b.parquet", 0, 10),
      entry(2, Some(2L), s"$qual/c.parquet", 0, 51)))
    new java.io.File(dir, "metadata").mkdirs()
    writeAvro(s"$dir/metadata/snap-7.avro", foreignListSchema, Seq(
      listEntry(s"$qual/m1.avro", 0, 1L),
      listEntry(s"$qual/m2.avro", 0, 2L)))
    writeMetadata(dir, 7L, s"$qual/metadata/snap-7.avro")

    assert(IcebergExport.read(spark, dir).as[Int].collect().sorted.toSeq ==
      (1 to 20), "byte-identical read; DELETED entry excluded")
    assert(IcebergExport.activeFiles(spark, dir).toSet ==
      Set(s"$qual/a.parquet", s"$qual/b.parquet"))
    // no stats maps anywhere: pruning keeps every file (fail-open) and
    // loses no rows
    assert(IcebergExport.activeFilesPruned(spark, dir, "v", "15", "16").size == 2)
    assert(IcebergExport.readPruned(spark, dir, "v", "15", "16")
      .where("v BETWEEN 15 AND 16").count() == 2)
  }

  test("equality deletes apply with sequence scoping, null-safe matching, " +
      "and compose with position deletes on a foreign layout") {
    val dir = tmpDir()
    val qual = s"file:$dir"
    // file a (seq 1): 1..10 then two NULLs — row order fixed by coalesce(1)
    val aRows = ((1 to 10).map(i => Row(Integer.valueOf(i))) ++
      Seq(Row(null), Row(null)))
    landParquet(spark.createDataFrame(
      spark.sparkContext.parallelize(aRows, 1),
      StructType(Seq(StructField("v", IntegerType, nullable = true)))),
      dir, "a.parquet")
    // file b (seq 2, SAME commit as the equality delete): exempt
    landParquet(Seq(3, 100).toDF("v"), dir, "b.parquet")
    // equality delete (seq 2, equality_ids=[1] → column v): values 3, 5,
    // and NULL — null must match a's null rows (the spec's semantics)
    landParquet(spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(Integer.valueOf(3)), Row(Integer.valueOf(5)), Row(null)), 1),
      StructType(Seq(StructField("v", IntegerType, nullable = true)))),
      dir, "eqdel.parquet")
    // position delete (seq 2) killing a.parquet row 0 (v=1) — the
    // foreign flat layout must still key correctly (file-name tail)
    landParquet(Seq((s"$qual/a.parquet", 0L)).toDF("file_path", "pos"),
      dir, "posdel.parquet")

    writeAvro(s"$dir/m-data.avro", foreignEntrySchema, Seq(
      entry(1, Some(1L), s"$qual/a.parquet", 0, 12),
      entry(1, Some(2L), s"$qual/b.parquet", 0, 2)))
    writeAvro(s"$dir/m-del.avro", foreignEntrySchema, Seq(
      entry(1, Some(2L), s"$qual/eqdel.parquet", 2, 3, eqIds = Seq(1)),
      entry(1, Some(2L), s"$qual/posdel.parquet", 1, 1)))
    new java.io.File(dir, "metadata").mkdirs()
    writeAvro(s"$dir/metadata/snap-9.avro", foreignListSchema, Seq(
      listEntry(s"$qual/m-data.avro", 0, 2L),
      listEntry(s"$qual/m-del.avro", 1, 2L)))
    writeMetadata(dir, 9L, s"$qual/metadata/snap-9.avro")

    val got = IcebergExport.read(spark, dir).collect()
      .map(r => if (r.isNullAt(0)) -1 else r.getInt(0)).sorted.toSeq
    // a loses: v=1 (position delete), v=3, v=5 (equality), both NULLs
    // (null-safe equality); b keeps BOTH rows — its sequence (2) is not
    // strictly below the delete's (2)
    assert(got == Seq(2, 3, 4, 6, 7, 8, 9, 10, 100))
    // the position-delete list surfaces; equality files are read-path-only
    assert(IcebergExport.activeDeleteFiles(spark, dir) ==
      Seq(s"$qual/posdel.parquet"))
  }

  // ---- FORMAT-VERSION 1 (the long tail of real deployments) -------------

  /** v1 manifest-entry schema: NO sequence_number, data_file carries
    * the v1-required block_size_in_bytes and NO content field. */
  private val v1EntrySchema: AvroSchema = new AvroSchema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"snapshot_id","type":"long"},
      |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |  {"name":"file_path","type":"string"},
      |  {"name":"file_format","type":"string"},
      |  {"name":"record_count","type":"long"},
      |  {"name":"file_size_in_bytes","type":"long"},
      |  {"name":"block_size_in_bytes","type":"long"}
      |]}}
      |]}""".stripMargin)

  /** v1 manifest-list schema: NO content, NO sequence numbers. */
  private val v1ListSchema: AvroSchema = new AvroSchema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string"},
      |{"name":"manifest_length","type":"long"},
      |{"name":"partition_spec_id","type":"int"},
      |{"name":"added_snapshot_id","type":["null","long"],"default":null}
      |]}""".stripMargin)

  private def v1Entry(status: Int, path: String, records: Long): GenericRecord = {
    val df = new GenericData.Record(v1EntrySchema.getField("data_file").schema())
    df.put("file_path", path)
    df.put("file_format", "PARQUET")
    df.put("record_count", java.lang.Long.valueOf(records))
    df.put("file_size_in_bytes", java.lang.Long.valueOf(10L))
    df.put("block_size_in_bytes", java.lang.Long.valueOf(67108864L))
    val e = new GenericData.Record(v1EntrySchema)
    e.put("status", status)
    e.put("snapshot_id", java.lang.Long.valueOf(3L))
    e.put("data_file", df)
    e
  }

  /** v1 metadata: format-version 1, LEGACY singular `schema` and
    * `partition-spec`, no sequence numbers anywhere; the snapshot
    * either points at a manifest-list or inlines a legacy `manifests`
    * array. */
  private def writeV1Metadata(dir: String, snapshotId: Long,
      manifestsRef: String): Unit = {
    val md = new java.io.File(dir, "metadata"); md.mkdirs()
    val json =
      s"""{
         |  "format-version": 1,
         |  "table-uuid": "99999999-8888-7777-6666-555555555555",
         |  "location": "$dir",
         |  "last-updated-ms": 1600000000000,
         |  "last-column-id": 1,
         |  "schema": {"type": "struct", "fields": [
         |    {"id": 1, "name": "v", "required": false, "type": "int"}]},
         |  "partition-spec": [],
         |  "properties": {"write.format.default": "parquet"},
         |  "current-snapshot-id": $snapshotId,
         |  "snapshots": [{"snapshot-id": $snapshotId,
         |    "timestamp-ms": 1600000000000,
         |    $manifestsRef,
         |    "summary": {"operation": "append"}}]
         |}""".stripMargin
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/metadata/v1.metadata.json"),
      json.getBytes("UTF-8"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/metadata/version-hint.text"),
      "1".getBytes("UTF-8"))
  }

  test("format-version 1: manifest-list without content/sequence fields reads " +
      "byte-identical; status=2 still excluded; stats prune fails open") {
    val dir = tmpDir()
    val qual = s"file:$dir"
    landParquet((1 to 10).toDF("v"), dir, "a.parquet")
    landParquet((11 to 20).toDF("v"), dir, "b.parquet")
    landParquet((500 to 550).toDF("v"), dir, "gone.parquet")
    writeAvro(s"$dir/m1.avro", v1EntrySchema, Seq(
      v1Entry(1, s"$qual/a.parquet", 10)))
    writeAvro(s"$dir/m2.avro", v1EntrySchema, Seq(
      v1Entry(0, s"$qual/b.parquet", 10),
      v1Entry(2, s"$qual/gone.parquet", 51)))
    new java.io.File(dir, "metadata").mkdirs()
    writeAvro(s"$dir/metadata/snap-3.avro", v1ListSchema, Seq({
      val mf = new GenericData.Record(v1ListSchema)
      mf.put("manifest_path", s"$qual/m1.avro")
      mf.put("manifest_length", java.lang.Long.valueOf(
        new java.io.File(s"$dir/m1.avro").length()))
      mf.put("partition_spec_id", 0)
      mf.put("added_snapshot_id", java.lang.Long.valueOf(3L))
      mf
    }, {
      val mf = new GenericData.Record(v1ListSchema)
      mf.put("manifest_path", s"$qual/m2.avro")
      mf.put("manifest_length", java.lang.Long.valueOf(
        new java.io.File(s"$dir/m2.avro").length()))
      mf.put("partition_spec_id", 0)
      mf.put("added_snapshot_id", java.lang.Long.valueOf(3L))
      mf
    }))
    writeV1Metadata(dir, 3L,
      s""""manifest-list": "$qual/metadata/snap-3.avro"""")

    assert(IcebergExport.read(spark, dir).as[Int].collect().sorted.toSeq ==
      (1 to 20), "v1 read: byte-identical, DELETED entry excluded")
    assert(IcebergExport.activeFiles(spark, dir).toSet ==
      Set(s"$qual/a.parquet", s"$qual/b.parquet"))
    assert(IcebergExport.activeDeleteFiles(spark, dir).isEmpty)
    // no stats maps in the v1 entry schema: prune keeps both files
    assert(IcebergExport.activeFilesPruned(spark, dir, "v", "15", "16").size == 2)
    assert(IcebergExport.readPruned(spark, dir, "v", "15", "16")
      .where("v BETWEEN 15 AND 16").count() == 2)
  }

  test("format-version 1: legacy inline `manifests` array (no manifest-list)") {
    val dir = tmpDir()
    val qual = s"file:$dir"
    landParquet((1 to 7).toDF("v"), dir, "only.parquet")
    writeAvro(s"$dir/m1.avro", v1EntrySchema, Seq(
      v1Entry(1, s"$qual/only.parquet", 7)))
    writeV1Metadata(dir, 5L, s""""manifests": ["$qual/m1.avro"]""")
    assert(IcebergExport.read(spark, dir).as[Int].collect().sorted.toSeq ==
      (1 to 7))
  }

  test("non-identity partition transforms (bucket) read tolerantly: " +
      "bounds pruning still works, partition equality-prune stays off") {
    val dir = tmpDir()
    val qual = s"file:$dir"
    landParquet((1 to 10).toDF("v"), dir, "a.parquet")
    landParquet((100 to 110).toDF("v"), dir, "b.parquet")
    // entries carry a partition record holding the BUCKET ordinal (the
    // foreign writer's layout) — not a value the reader may equate with
    // the column
    val entrySchema = new AvroSchema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |{"name":"status","type":"int"},
        |{"name":"sequence_number","type":["null","long"],"default":null},
        |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
        |  {"name":"file_path","type":"string"},
        |  {"name":"file_format","type":"string"},
        |  {"name":"content","type":"int"},
        |  {"name":"partition","type":{"type":"record","name":"p","fields":[
        |    {"name":"v_bucket","type":"int"}]}},
        |  {"name":"record_count","type":"long"},
        |  {"name":"file_size_in_bytes","type":"long"}
        |]}}
        |]}""".stripMargin)
    def entry(path: String, bucket: Int, records: Long): GenericRecord = {
      val part = new GenericData.Record(
        entrySchema.getField("data_file").schema().getField("partition").schema())
      part.put("v_bucket", bucket)
      val df = new GenericData.Record(entrySchema.getField("data_file").schema())
      df.put("file_path", path); df.put("file_format", "PARQUET")
      df.put("content", 0); df.put("partition", part)
      df.put("record_count", java.lang.Long.valueOf(records))
      df.put("file_size_in_bytes", java.lang.Long.valueOf(10L))
      val e = new GenericData.Record(entrySchema)
      e.put("status", 1)
      e.put("sequence_number", java.lang.Long.valueOf(1L))
      e.put("data_file", df)
      e
    }
    writeAvro(s"$dir/m1.avro", entrySchema, Seq(
      entry(s"$qual/a.parquet", 2, 10), entry(s"$qual/b.parquet", 3, 11)))
    new java.io.File(dir, "metadata").mkdirs()
    writeAvro(s"$dir/metadata/snap-5.avro", foreignListSchema, Seq(
      listEntry(s"$qual/m1.avro", 0, 1L)))
    // v2 metadata whose default spec buckets column v
    val md = new java.io.File(dir, "metadata"); md.mkdirs()
    val json =
      s"""{
         |  "format-version": 2, "table-uuid": "bbbb-cccc", "location": "$dir",
         |  "last-sequence-number": 5, "last-updated-ms": 1, "last-column-id": 1,
         |  "current-schema-id": 0,
         |  "schemas": [{"type": "struct", "schema-id": 0, "fields": [
         |    {"id": 1, "name": "v", "required": false, "type": "int"}]}],
         |  "default-spec-id": 0,
         |  "partition-specs": [{"spec-id": 0, "fields": [
         |    {"name": "v_bucket", "transform": "bucket[4]",
         |     "source-id": 1, "field-id": 1000}]}],
         |  "last-partition-id": 1000, "default-sort-order-id": 0,
         |  "sort-orders": [{"order-id": 0, "fields": []}],
         |  "current-snapshot-id": 5,
         |  "snapshots": [{"snapshot-id": 5, "sequence-number": 5,
         |    "timestamp-ms": 1, "manifest-list": "$qual/metadata/snap-5.avro",
         |    "summary": {"operation": "append"}, "schema-id": 0}]
         |}""".stripMargin
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/metadata/v1.metadata.json"),
      json.getBytes("UTF-8"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/metadata/version-hint.text"),
      "1".getBytes("UTF-8"))

    assert(IcebergExport.read(spark, dir).as[Int].collect().sorted.toSeq ==
      ((1 to 10) ++ (100 to 110)), "bucket-partitioned tree reads byte-identical")
    // pruning on v: the spec's transform is bucket[4], NOT identity, so
    // the partition record must NOT be equated with the column value
    // (bucket ordinal 2 != v=2); with no stats maps the prune keeps both
    // files — fail-open, never a wrong skip
    assert(IcebergExport.activeFilesPruned(spark, dir, "v", "2", "3").size == 2)
    assert(IcebergExport.readPruned(spark, dir, "v", "105", "106")
      .where("v BETWEEN 105 AND 106").count() == 2)
  }

  // ---- FORMAT-VERSION 3: the deletion-vector subset ---------------------

  /** v3 manifest-entry schema: the v2 shape plus the DV reference
    * fields (143-145) on data_file. */
  private val v3EntrySchema: AvroSchema = new AvroSchema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |  {"name":"file_format","type":"string"},
      |  {"name":"record_count","type":"long"},
      |  {"name":"file_path","type":"string"},
      |  {"name":"content","type":"int"},
      |  {"name":"file_size_in_bytes","type":"long"},
      |  {"name":"referenced_data_file","type":["null","string"],"default":null},
      |  {"name":"content_offset","type":["null","long"],"default":null},
      |  {"name":"content_size_in_bytes","type":["null","long"],"default":null}
      |]}},
      |{"name":"status","type":"int"},
      |{"name":"snapshot_id","type":["null","long"],"default":null},
      |{"name":"sequence_number","type":["null","long"],"default":null}
      |]}""".stripMargin)

  private def v3Entry(seq: Long, path: String, content: Int, records: Long,
      dvRef: Option[(String, Long, Long)] = None): GenericRecord = {
    val df = new GenericData.Record(
      v3EntrySchema.getField("data_file").schema())
    df.put("file_format", if (content == 1 && dvRef.isDefined) "PUFFIN"
      else "PARQUET")
    df.put("record_count", java.lang.Long.valueOf(records))
    df.put("file_path", path)
    df.put("content", content)
    df.put("file_size_in_bytes", java.lang.Long.valueOf(10L))
    dvRef.foreach { case (ref, off, size) =>
      df.put("referenced_data_file", ref)
      df.put("content_offset", java.lang.Long.valueOf(off))
      df.put("content_size_in_bytes", java.lang.Long.valueOf(size))
    }
    val e = new GenericData.Record(v3EntrySchema)
    e.put("data_file", df)
    e.put("status", 1)
    e.put("snapshot_id", java.lang.Long.valueOf(7L))
    e.put("sequence_number", java.lang.Long.valueOf(seq))
    e
  }

  /** A minimal Puffin file: the 4-byte header magic, then ONE
    * deletion-vector-v1 blob (BE length prefix of magic+vector, the
    * vector in Delta's RoaringBitmapArray serialization — v3 adopted
    * it verbatim — and a BE CRC-32 of the prefixed bytes). Returns
    * (blob offset, content_size_in_bytes = L + 8). The footer is
    * omitted: a manifest-driven reader locates blobs by offset. */
  private def writePuffin(path: String, positions: Seq[Long]): (Long, Long) = {
    val vec = DeletionVector.encodeBitmapArray(positions)
    val out = new java.io.ByteArrayOutputStream()
    out.write("PFA1".getBytes("UTF-8"))
    val offset = out.size().toLong
    out.write(java.nio.ByteBuffer.allocate(4).putInt(vec.length).array())
    out.write(vec)
    val crc = new java.util.zip.CRC32
    crc.update(vec)
    out.write(java.nio.ByteBuffer.allocate(4)
      .putInt(crc.getValue.toInt).array())
    java.nio.file.Files.write(java.nio.file.Paths.get(path), out.toByteArray)
    (offset, vec.length + 8L)
  }

  private def writeV3Metadata(dir: String, snapshotId: Long,
      listPath: String, extraTop: String = "",
      fieldExtra: String = ""): Unit = {
    val md = new java.io.File(dir, "metadata"); md.mkdirs()
    val json =
      s"""{
         |  "format-version": 3,
         |  "table-uuid": "33333333-2222-3333-4444-555555555555",
         |  "location": "$dir",$extraTop
         |  "last-sequence-number": $snapshotId,
         |  "last-updated-ms": 1700000000000,
         |  "last-column-id": 1,
         |  "current-schema-id": 0,
         |  "schemas": [{"type": "struct", "schema-id": 0, "fields": [
         |    {"id": 1, "name": "v", "required": false, "type": "int"$fieldExtra}]}],
         |  "default-spec-id": 0,
         |  "partition-specs": [{"spec-id": 0, "fields": []}],
         |  "last-partition-id": 999,
         |  "default-sort-order-id": 0,
         |  "sort-orders": [{"order-id": 0, "fields": []}],
         |  "current-snapshot-id": $snapshotId,
         |  "snapshots": [{"snapshot-id": $snapshotId,
         |    "sequence-number": $snapshotId, "timestamp-ms": 1700000000000,
         |    "manifest-list": "$listPath",
         |    "summary": {"operation": "append"}, "schema-id": 0}],
         |  "snapshot-log": [{"timestamp-ms": 1700000000000,
         |    "snapshot-id": $snapshotId}]
         |}""".stripMargin
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/metadata/v1.metadata.json"),
      json.getBytes("UTF-8"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/metadata/version-hint.text"),
      "1".getBytes("UTF-8"))
  }

  test("format-version 3: a Puffin deletion vector reads correctly") {
    val dir = tmpDir()
    val qual = s"file:$dir"
    landParquet((1 to 10).toDF("v"), dir, "a.parquet")
    landParquet((11 to 20).toDF("v"), dir, "b.parquet")
    // the DV kills a.parquet rows 0, 3, 9 (v = 1, 4, 10)
    val (off, size) = writePuffin(s"$dir/dv.puffin", Seq(0L, 3L, 9L))
    writeAvro(s"$dir/m-data.avro", v3EntrySchema, Seq(
      v3Entry(1L, s"$qual/a.parquet", 0, 10),
      v3Entry(2L, s"$qual/b.parquet", 0, 10)))
    writeAvro(s"$dir/m-del.avro", v3EntrySchema, Seq(
      v3Entry(3L, s"$qual/dv.puffin", 1, 3,
        dvRef = Some((s"$qual/a.parquet", off, size)))))
    new java.io.File(dir, "metadata").mkdirs()
    writeAvro(s"$dir/metadata/snap-7.avro", foreignListSchema, Seq(
      listEntry(s"$qual/m-data.avro", 0, 2L),
      listEntry(s"$qual/m-del.avro", 1, 3L)))
    writeV3Metadata(dir, 7L, s"$qual/metadata/snap-7.avro")

    assert(IcebergExport.read(spark, dir).as[Int].collect().sorted.toSeq ==
      Seq(2, 3, 5, 6, 7, 8, 9) ++ (11 to 20),
      "DV-deleted positions must drop; the other file reads whole")
    // DVs are not classic position-delete FILES — the parquet list
    // stays empty; only the full read paths apply them
    assert(IcebergExport.activeDeleteFiles(spark, dir).isEmpty)
    // stats-free pruning composes: fail-open keeps both files and the
    // DV still applies on the pruned read
    assert(IcebergExport.readPruned(spark, dir, "v", "1", "6")
      .where("v BETWEEN 1 AND 6").as[Int].collect().sorted.toSeq ==
      Seq(2, 3, 5, 6))
  }

  test("format-version 3 refuses row lineage and default values BY NAME; v4 refuses") {
    // row lineage
    val dir = tmpDir()
    writeV3Metadata(dir, 7L, s"file:$dir/metadata/none.avro",
      extraTop = "\n  \"row-lineage\": true,")
    val e1 = intercept[UnsupportedOperationException](
      IcebergExport.read(spark, dir))
    assert(e1.getMessage.contains("ROW LINEAGE"))
    // column default values
    val dir2 = tmpDir()
    writeV3Metadata(dir2, 7L, s"file:$dir2/metadata/none.avro",
      fieldExtra = """, "initial-default": 42""")
    val e2 = intercept[UnsupportedOperationException](
      IcebergExport.read(spark, dir2))
    assert(e2.getMessage.contains("DEFAULT VALUES") &&
      e2.getMessage.contains("v"))
    // an unknown format-version still refuses naming it
    val dir3 = tmpDir()
    val md3 = new java.io.File(dir3, "metadata"); md3.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir3/metadata/v1.metadata.json"),
      """{"format-version": 4, "table-uuid": "x"}""".getBytes("UTF-8"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir3/metadata/version-hint.text"),
      "1".getBytes("UTF-8"))
    val e3 = intercept[UnsupportedOperationException](
      IcebergExport.read(spark, dir3))
    assert(e3.getMessage.contains("format-version") &&
      e3.getMessage.contains("4"))
  }

  test("equality delete naming an unknown or missing field id fails loudly") {
    val dir = tmpDir()
    val qual = s"file:$dir"
    landParquet((1 to 5).toDF("v"), dir, "a.parquet")
    landParquet(Seq(1).toDF("v"), dir, "eqdel.parquet")
    writeAvro(s"$dir/m-data.avro", foreignEntrySchema,
      Seq(entry(1, Some(1L), s"$qual/a.parquet", 0, 5)))
    // equality_ids = [42]: no such field in the schema
    writeAvro(s"$dir/m-del.avro", foreignEntrySchema,
      Seq(entry(1, Some(2L), s"$qual/eqdel.parquet", 2, 1, eqIds = Seq(42))))
    new java.io.File(dir, "metadata").mkdirs()
    writeAvro(s"$dir/metadata/snap-3.avro", foreignListSchema, Seq(
      listEntry(s"$qual/m-data.avro", 0, 1L),
      listEntry(s"$qual/m-del.avro", 1, 2L)))
    writeMetadata(dir, 3L, s"$qual/metadata/snap-3.avro")
    val ex = intercept[UnsupportedOperationException] {
      IcebergExport.read(spark, dir).count()
    }
    assert(ex.getMessage.contains("field id 42"))
    // and content=2 WITHOUT equality_ids refuses naming the file
    val dir2 = tmpDir()
    val qual2 = s"file:$dir2"
    landParquet((1 to 5).toDF("v"), dir2, "a.parquet")
    landParquet(Seq(1).toDF("v"), dir2, "eqdel.parquet")
    writeAvro(s"$dir2/m-data.avro", foreignEntrySchema,
      Seq(entry(1, Some(1L), s"$qual2/a.parquet", 0, 5)))
    writeAvro(s"$dir2/m-del.avro", foreignEntrySchema,
      Seq(entry(1, Some(2L), s"$qual2/eqdel.parquet", 2, 1)))
    new java.io.File(dir2, "metadata").mkdirs()
    writeAvro(s"$dir2/metadata/snap-3.avro", foreignListSchema, Seq(
      listEntry(s"$qual2/m-data.avro", 0, 1L),
      listEntry(s"$qual2/m-del.avro", 1, 2L)))
    writeMetadata(dir2, 3L, s"$qual2/metadata/snap-3.avro")
    val ex2 = intercept[UnsupportedOperationException] {
      IcebergExport.read(spark, dir2).count()
    }
    assert(ex2.getMessage.contains("equality_ids") &&
      ex2.getMessage.contains("content=2"))
  }
}
