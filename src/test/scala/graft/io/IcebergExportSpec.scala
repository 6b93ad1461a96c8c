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

  test("incremental append scan: appends-since serves the delta, rewrites refuse") {
    val dir = tmpDir()
    Manifest.write((1 to 10).toDF("v"), dir, "s1") // seq 0
    Manifest.append((11 to 15).toDF("v"), dir, "s2") // seq 1
    Manifest.append((16 to 18).toDF("v"), dir, "s3") // seq 2
    IcebergExport.exportTable(spark, dir)
    // appends after snapshot 0: exactly the rows of seq 1 + seq 2
    val delta = IcebergExport.readAppendsSince(spark, dir, 0L)
    assert(delta.isDefined)
    assert(delta.get.as[Int].collect().sorted.toSeq == (11 to 18))
    // appends after snapshot 1: just seq 2
    assert(IcebergExport.readAppendsSince(spark, dir, 1L)
      .get.as[Int].collect().sorted.toSeq == (16 to 18))
    // current snapshot: no changes
    assert(IcebergExport.readAppendsSince(spark, dir, 2L).isEmpty)
    // unknown baseline fails loudly
    intercept[IllegalArgumentException](
      IcebergExport.readAppendsSince(spark, dir, 99L))
    // the composed incremental pipeline shape: export -> incremental
    // read -> aggregate equals a full-table recomputation of the delta
    assert(delta.get.agg(org.apache.spark.sql.functions.sum("v"))
      .collect().head.getLong(0) == (11 to 18).sum)
    // a compaction (rewrite) in the span refuses: its files re-pack
    // rows the baseline already contained
    Manifest.compact(spark, dir, "c1", 128L * 1024 * 1024) // seq 3
    IcebergExport.exportTable(spark, dir)
    val e = intercept[IllegalStateException](
      IcebergExport.readAppendsSince(spark, dir, 1L))
    assert(e.getMessage.contains("re-baseline"))
    // re-baselining on the rewrite itself works again
    Manifest.append((19 to 20).toDF("v"), dir, "s4") // seq 4
    IcebergExport.exportTable(spark, dir)
    assert(IcebergExport.readAppendsSince(spark, dir, 3L)
      .get.as[Int].collect().sorted.toSeq == (19 to 20))
  }

  test("column-mapped export: renamed column KEEPS its field id; bounds prune by logical name") {
    val wh = java.nio.file.Files.createTempDirectory("icewh").toString
    spark.conf.set("spark.sql.catalog.gice", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gice.warehouse", wh)
    spark.sql("CREATE NAMESPACE gice.db")
    spark.sql("CREATE TABLE gice.db.cm (k BIGINT, val BIGINT) USING graft")
    spark.sql("INSERT INTO gice.db.cm SELECT id, id * 10 FROM range(0, 100)")
    val dir = s"$wh/db/cm"
    // export BEFORE the rename pins the original field ids
    IcebergExport.exportTable(spark, dir)
    def idOf(name: String): Int = {
      val metaTxt = new String(java.nio.file.Files.readAllBytes(
        new java.io.File(dir, "metadata").listFiles()
          .filter(_.getName.endsWith(".metadata.json"))
          .maxBy(_.getName).toPath))
      val j = org.json4s.jackson.JsonMethods.parse(metaTxt)
      val org.json4s.JArray(schemas) = j \ "schemas"
      val fields = schemas.flatMap(s => s \ "fields" match {
        case org.json4s.JArray(fs) => fs; case _ => Nil
      })
      fields.collectFirst {
        case f if (f \ "name") == org.json4s.JString(name) =>
          (f \ "id").asInstanceOf[org.json4s.JInt].num.toInt
      }.getOrElse(fail(s"no field '$name' in any exported schema"))
    }
    val idBefore = idOf("val")
    spark.sql("ALTER TABLE gice.db.cm RENAME COLUMN val TO score")
    spark.sql("INSERT INTO gice.db.cm VALUES (200, 2000)")
    IcebergExport.exportTable(spark, dir)
    // Iceberg rename semantics: SAME field id under the new name
    assert(idOf("score") == idBefore,
      "a renamed column must keep its Iceberg field id")
    // reads serve logical names; values span pre- and post-rename files
    val got = IcebergExport.read(spark, dir)
    assert(got.columns.toSeq == Seq("k", "score"))
    assert(got.where("k = 200").collect().head.getLong(1) == 2000L)
    assert(got.count() == 101)
    // bounds pruning by the LOGICAL name still bites: the stats were
    // encoded under the stable field id from physical-keyed footers
    val pruned = IcebergExport.readPruned(spark, dir, "score", "980", "2010")
    // files outside the bounds are dropped (row filtering stays the
    // caller's job); the kept files hold 980, 990 and the 2000 row
    assert(pruned.count() < 101, "bounds pruning must drop files")
    assert(pruned.where("score BETWEEN 980 AND 2010").collect()
      .map(_.getLong(1)).sorted.toSeq == Seq(980L, 990L, 2000L))
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

  test("manifests carry value/null counts and spec-encoded bounds") {
    val dir = tmpDir()
    Manifest.write(
      spark.range(0, 1000)
        .selectExpr("id", "CAST(id AS DOUBLE)/4 AS x",
          "md5(CAST(id AS STRING)) AS s", "CAST(NULL AS STRING) AS dead")
        .repartitionByRange(4, org.apache.spark.sql.functions.col("id")),
      dir, "s1")
    IcebergExport.exportTable(spark, dir)
    val meta = IcebergExport.currentMetadata(spark, dir)
    val JArray(snaps) = meta \ "snapshots"
    val JString(list0) = snaps.head \ "manifest-list"
    val entries = rawAvro(rawAvro(list0).head.get("manifest_path").toString)
    assert(entries.size == 4)
    // field ids from the schema JSON: id=1, x=2, s=3, dead=4
    def mapOf(df: GenericRecord, field: String): Map[Int, AnyRef] =
      Option(df.get(field)).map(_.asInstanceOf[java.util.Collection[GenericRecord]]
        .asScala.map(r => r.get("key").asInstanceOf[Int] -> r.get("value")).toMap)
        .getOrElse(Map.empty)
    def le(buf: AnyRef): java.nio.ByteBuffer =
      buf.asInstanceOf[java.nio.ByteBuffer].duplicate()
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var total = 0L
    var globalMin = Long.MaxValue
    var globalMax = Long.MinValue
    entries.foreach { e =>
      val df = e.get("data_file").asInstanceOf[GenericRecord]
      val n = df.get("record_count").asInstanceOf[java.lang.Long].longValue()
      val vc = mapOf(df, "value_counts")
      val nc = mapOf(df, "null_value_counts")
      val lb = mapOf(df, "lower_bounds")
      val ub = mapOf(df, "upper_bounds")
      // value_counts include nulls: every column counts every record
      assert(vc(1) == java.lang.Long.valueOf(n) && vc(4) == java.lang.Long.valueOf(n))
      assert(nc(1) == java.lang.Long.valueOf(0L))
      assert(nc(4) == java.lang.Long.valueOf(n), "all-null column")
      assert(!lb.contains(4) && !ub.contains(4), "no bounds for all-null")
      // spec single-value binary: LE long / LE double / UTF-8 string
      val idLo = le(lb(1)).getLong
      val idHi = le(ub(1)).getLong
      assert(idLo <= idHi)
      total += n
      globalMin = math.min(globalMin, idLo); globalMax = math.max(globalMax, idHi)
      assert(le(lb(2)).getDouble == idLo / 4.0)
      assert(le(ub(2)).getDouble == idHi / 4.0)
      val sLo = {
        val bb = lb(3).asInstanceOf[java.nio.ByteBuffer].duplicate()
        val b = new Array[Byte](bb.remaining()); bb.get(b)
        new String(b, java.nio.charset.StandardCharsets.UTF_8)
      }
      assert(sLo.matches("[0-9a-f]{32}"))
    }
    assert(total == 1000 && globalMin == 0 && globalMax == 999)
  }

  test("bounds-driven pruning keeps every matching row and skips files") {
    val dir = tmpDir()
    Manifest.write(
      spark.range(0, 1000).toDF("id")
        .repartitionByRange(4, org.apache.spark.sql.functions.col("id")),
      dir, "s1")
    IcebergExport.exportTable(spark, dir)
    val all = IcebergExport.activeFiles(spark, dir)
    val kept = IcebergExport.activeFilesPruned(spark, dir, "id", "0", "249")
    assert(kept.nonEmpty && kept.size < all.size,
      s"bounds must prune some of ${all.size} files, kept ${kept.size}")
    assert(IcebergExport.readPruned(spark, dir, "id", "0", "249")
      .where("id <= 249").count() == 250)
    assert(IcebergExport.activeFilesPruned(spark, dir, "id", "5000", "9999").isEmpty)
    val none = IcebergExport.readPruned(spark, dir, "id", "5000", "9999")
    assert(none.count() == 0 && none.schema.fieldNames.toSeq == Seq("id"))
    // timestamp bounds prune via the micros value space
    val dir2 = tmpDir()
    Manifest.write(
      spark.range(0, 240)
        .selectExpr("id",
          "timestamp_ntz'2022-01-01 00:00:00' + make_interval(0,0,0,0,id,0,0) AS ts")
        .repartitionByRange(4, org.apache.spark.sql.functions.col("ts")),
      dir2, "s1")
    IcebergExport.exportTable(spark, dir2)
    val keptTs = IcebergExport.activeFilesPruned(spark, dir2, "ts",
      "2022-01-01T00:00:00", "2022-01-02T12:00:00")
    assert(keptTs.nonEmpty &&
      keptTs.size < IcebergExport.activeFiles(spark, dir2).size)
    assert(IcebergExport.readPruned(spark, dir2, "ts",
      "2022-01-01T00:00:00", "2022-01-02T12:00:00")
      .where("ts <= timestamp_ntz'2022-01-02 12:00:00'").count() == 37)
  }

  test("partitioned tables: identity spec, typed partition records, exact prune") {
    val dir = tmpDir()
    Manifest.writePartitioned(
      spark.sql(
        """SELECT id, CASE CAST(id % 3 AS INT) WHEN 0 THEN 'de'
          |  WHEN 1 THEN 'en' ELSE 'fr' END AS lang
          |FROM range(0, 300)""".stripMargin),
      dir, "p1", Seq("lang"))
    IcebergExport.exportTable(spark, dir)
    val meta = IcebergExport.currentMetadata(spark, dir)
    // spec: one identity field on lang, source-id = lang's schema id,
    // 1000-series partition field id; last-partition-id advanced
    val JArray(specs) = meta \ "partition-specs"
    val JArray(pfs) = specs.head \ "fields"
    assert(pfs.size == 1)
    assert(pfs.head \ "name" == JString("lang"))
    assert(pfs.head \ "transform" == JString("identity"))
    assert(pfs.head \ "field-id" == JInt(1000))
    val JArray(schemas) = meta \ "schemas"
    val JArray(fields) = schemas.head \ "fields"
    val langId = fields.find(f => f \ "name" == JString("lang")).get \ "id"
    assert(pfs.head \ "source-id" == langId)
    assert(meta \ "last-partition-id" == JInt(1000))
    // raw Avro: every entry's partition record carries the typed value,
    // consistent with its file path
    val JString(list0) = (meta \ "snapshots")(0) \ "manifest-list"
    val entries = rawAvro(rawAvro(list0).head.get("manifest_path").toString)
    assert(entries.nonEmpty)
    entries.foreach { e =>
      val df = e.get("data_file").asInstanceOf[GenericRecord]
      val part = df.get("partition").asInstanceOf[GenericRecord]
      assert(part.getSchema.getField("lang").getObjectProp("field-id") == 1000)
      val v = part.get("lang").toString
      assert(Set("de", "en", "fr")(v))
      assert(df.get("file_path").toString.contains(s"lang=$v"))
    }
    // reader: partition-record prune + basePath partition recovery
    val en = IcebergExport.readPruned(spark, dir, "lang", "en", "en")
    assert(en.count() == 100)
    assert(en.schema.fieldNames.toSet == Set("id", "lang"))
    assert(en.inputFiles.forall(_.contains("lang=en")))
    assert(IcebergExport.activeFilesPruned(spark, dir, "lang", "en", "en").size <
      IcebergExport.activeFiles(spark, dir).size)
    assert(IcebergExport.read(spark, dir).count() == 300)
  }

  test("schema evolution: stable field ids, schemas list, per-snapshot schema-id") {
    val dir = tmpDir()
    Manifest.write((1 to 50).toDF("v"), dir, "s1")
    assert(IcebergExport.exportTable(spark, dir) == 1)
    // evolve: overwrite with an added column — across a SEPARATE export
    // so the id allocator must seed from the published metadata
    Manifest.write((1 to 30).toDF("v")
      .withColumn("tag", org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("t"),
        org.apache.spark.sql.functions.col("v"))), dir, "s2")
    assert(IcebergExport.exportTable(spark, dir) == 2)
    val meta = IcebergExport.currentMetadata(spark, dir)
    val JArray(schemas) = meta \ "schemas"
    assert(schemas.size == 2, "one schema per distinct shape, in commit order")
    def ids(s: JValue): Map[String, BigInt] = {
      val JArray(fs) = s \ "fields"
      fs.map(f => { val JString(n) = f \ "name"; val JInt(i) = f \ "id"; n -> i }).toMap
    }
    val s0 = ids(schemas.head); val s1 = ids(schemas(1))
    assert(s0.keySet == Set("v") && s1.keySet == Set("v", "tag"))
    assert(s0("v") == s1("v"), "a column keeps its id across evolution")
    assert(s1("tag") > s0("v"), "new columns allocate above the historical max")
    assert(meta \ "last-column-id" == JInt(s1("tag")))
    // snapshots reference their own schema generation
    val JArray(snaps) = meta \ "snapshots"
    assert(snaps.map(s => s \ "schema-id") == List(JInt(0), JInt(1)))
    assert(meta \ "current-snapshot-id" == JInt(1))
    assert((meta \ "current-schema-id") == JInt(1))
    // a third export with no schema change re-numbers NOTHING
    Manifest.write((1 to 9).toDF("v")
      .withColumn("tag", org.apache.spark.sql.functions.lit("x")), dir, "s3")
    assert(IcebergExport.exportTable(spark, dir) == 3)
    val meta3 = IcebergExport.currentMetadata(spark, dir)
    val JArray(schemas3) = meta3 \ "schemas"
    assert(schemas3.size == 2 && ids(schemas3(1)) == s1)
    assert(IcebergExport.read(spark, dir).count() == 9)
    assert(IcebergExport.readSnapshot(spark, dir, 0L).columns.toSeq == Seq("v"))
  }

  test("merge-on-read deletes export as content=1 position-delete manifests") {
    val dir = tmpDir()
    Manifest.write(
      spark.range(0, 1000).toDF("id")
        .repartitionByRange(4, org.apache.spark.sql.functions.col("id")),
      dir, "base")
    Manifest.deleteRangeMOR(spark, dir, "id", "250", "499", "mor1")
    IcebergExport.exportTable(spark, dir)
    val meta = IcebergExport.currentMetadata(spark, dir)
    val JArray(snaps) = meta \ "snapshots"
    // snapshot 0 (pre-delete): data manifest only; snapshot 1: + deletes
    val JString(list0) = snaps.head \ "manifest-list"
    assert(rawAvro(list0).map(_.get("content")) == Seq(0))
    val JString(list1) = snaps(1) \ "manifest-list"
    val mfs1 = rawAvro(list1)
    assert(mfs1.map(_.get("content")).sortBy(_.toString) == Seq(0, 1))
    val delMf = mfs1.find(_.get("content") == 1).get
    assert(delMf.get("sequence_number").toString.toLong == 1)
    // the delete manifest's entries: content=1 data_file records whose
    // file_path is a FULL URI and whose rows carry full-URI + pos per
    // the spec's position-delete schema
    val delEntries = rawAvro(delMf.get("manifest_path").toString)
    assert(delEntries.nonEmpty)
    val ddf = delEntries.head.get("data_file").asInstanceOf[GenericRecord]
    assert(ddf.get("content") == 1)
    val delUri = ddf.get("file_path").toString
    assert(delUri.contains("_iceberg_deletes/deletes-mor1/"))
    assert(ddf.get("record_count").toString.toLong == 250)
    val rows = spark.read.parquet(delUri)
    assert(rows.columns.toSeq == Seq("file_path", "pos"))
    assert(rows.count() == 250)
    val fp = rows.selectExpr("min(file_path)").first().getString(0)
    assert(fp.contains("/data-base/") && !fp.startsWith("data-base/"),
      s"spec requires the FULL data-file URI, got $fp")
    // the reader applies the deletes; time travel to snapshot 0 does not
    import spark.implicits._
    assert(IcebergExport.activeDeleteFiles(spark, dir).size == 1)
    assert(IcebergExport.read(spark, dir).as[Long].collect().sorted.toSeq ==
      ((0L to 249L) ++ (500L to 999L)))
    assert(IcebergExport.readSnapshot(spark, dir, 0L).count() == 1000)
    // bounds pruning composes with MOR: prune to the low range, deletes
    // still applied inside it
    assert(IcebergExport.readPruned(spark, dir, "id", "0", "499")
      .where("id < 500").count() == 250)
  }

  test("snapshot-log carries commit instants; timestamp travel resolves on them") {
    val dir = tmpDir()
    Manifest.write((1 to 10).toDF("v"), dir, "s1")
    Thread.sleep(15)
    val mid = System.currentTimeMillis()
    Thread.sleep(15)
    Manifest.write((1 to 25).toDF("v"), dir, "s2")
    IcebergExport.exportTable(spark, dir)
    val meta = IcebergExport.currentMetadata(spark, dir)
    val JArray(log) = meta \ "snapshot-log"
    assert(log.map(e => e \ "snapshot-id") == List(JInt(0), JInt(1)))
    val times = log.map(e => { val JInt(t) = e \ "timestamp-ms"; t.toLong })
    assert(times(0) < mid && mid < times(1),
      "snapshot-log must carry the manifests' commit instants")
    // snapshots' own timestamp-ms agree with the log
    val JArray(snaps) = meta \ "snapshots"
    assert(snaps.map(s => s \ "timestamp-ms") == log.map(e => e \ "timestamp-ms"))
    assert(IcebergExport.snapshotIdAsOf(spark, dir, mid) == 0L)
    assert(IcebergExport.readAsOf(spark, dir, mid).count() == 10)
    assert(IcebergExport.readAsOf(spark, dir,
      System.currentTimeMillis()).count() == 25)
    intercept[IllegalArgumentException] {
      IcebergExport.snapshotIdAsOf(spark, dir, times(0) - 1000)
    }
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

  test("pruning resolves the TARGET snapshot's schema, not the oldest") {
    import org.apache.spark.sql.functions.col
    val dir = tmpDir()
    Manifest.write(spark.range(0, 100).toDF("id"), dir, "s1")
    IcebergExport.exportTable(spark, dir)
    // evolution: an ADDED column, range-clustered so files carry tight
    // disjoint bounds on it — absent from schemas[0], present in the
    // current schema (the ADVICE r7 case)
    Manifest.write(
      spark.range(0, 1000).toDF("id").withColumn("v", col("id") * 2)
        .repartitionByRange(4, col("v")), dir, "s2")
    IcebergExport.exportTable(spark, dir)
    val all = IcebergExport.activeFiles(spark, dir)
    val kept = IcebergExport.activeFilesPruned(spark, dir, "v", "0", "400")
    assert(kept.nonEmpty && kept.size < all.size,
      s"evolution-added column must prune: kept ${kept.size}/${all.size}")
    assert(IcebergExport.readPruned(spark, dir, "v", "0", "400")
      .where("v BETWEEN 0 AND 400").count() == 201)
    // time-travel prune resolves the OLD snapshot's OWN schema: it has
    // no 'v' — loud error, not a mis-decoded byte width
    val ex = intercept[IllegalArgumentException] {
      IcebergExport.activeFilesPruned(spark, dir, "v", "0", "400", Some(0L))
    }
    assert(ex.getMessage.contains("'v'"))
    assert(IcebergExport
      .activeFilesPruned(spark, dir, "id", "0", "99", Some(0L)).nonEmpty)
  }

  test("a crashed position-delete conversion is redone, never reused") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val dir = tmpDir()
    Manifest.write(spark.range(0, 1000).toDF("id")
      .repartitionByRange(4, col("id")), dir, "base")
    Manifest.deleteRangeMOR(spark, dir, "id", "250", "499", "mor1")
    // simulate a conversion job that died mid-commit: the output dir
    // exists with an EMPTY part set and no _SUCCESS marker — bare
    // dir-existence idempotence would reuse it and resurrect every
    // MOR-deleted row for external readers
    val outDir = s"$dir/_iceberg_deletes/deletes-mor1"
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("file_path", StringType),
        StructField("pos", LongType))))
      .coalesce(1).write.parquet(outDir)
    assert(new java.io.File(s"$outDir/_SUCCESS").delete())
    IcebergExport.exportTable(spark, dir)
    import spark.implicits._
    assert(IcebergExport.read(spark, dir).as[Long].collect().sorted.toSeq ==
      ((0L to 249L) ++ (500L to 999L)),
      "the partial conversion must be thrown away and redone")
    assert(new java.io.File(s"$outDir/_SUCCESS").exists(),
      "the redone conversion commits with its completion marker")
    val delFiles = IcebergExport.activeDeleteFiles(spark, dir)
    assert(delFiles.size == 1 &&
      spark.read.parquet(delFiles.head).count() == 250)
  }

  test("prune runs as Spark jobs; LE sign extension decodes negative bounds") {
    import org.apache.spark.sql.functions.col
    val dir = tmpDir()
    Manifest.write(
      spark.range(-5000, 5000).toDF("id")
        .withColumn("i32", col("id").cast("int"))
        .repartitionByRange(8, col("id")), dir, "s1")
    IcebergExport.exportTable(spark, dir)
    // the bounds decode + range filter must execute EXECUTOR-side (the
    // avro manifests scan as a frame), with only survivors collected
    spark.sparkContext.setJobGroup("iceberg-prune", "distributed prune", false)
    val kept = try IcebergExport
      .activeFilesPruned(spark, dir, "id", "-5000", "-4800")
      finally spark.sparkContext.clearJobGroup()
    assert(spark.sparkContext.statusTracker
      .getJobIdsForGroup("iceberg-prune").nonEmpty,
      "iceberg pruning must run as Spark jobs")
    assert(kept.size == 1, s"one 1250-wide range file overlaps: $kept")
    assert(IcebergExport.readPruned(spark, dir, "id", "-5000", "-4800")
      .where("id BETWEEN -5000 AND -4800").count() == 201)
    // 4-byte kind: the sign-extended int32 decode agrees
    assert(IcebergExport.readPruned(spark, dir, "i32", "-100", "100")
      .where("i32 BETWEEN -100 AND 100").count() == 201)
    // straddling zero exercises both sign branches in one range test
    val keptMid = IcebergExport.activeFilesPruned(spark, dir, "id", "-1", "1")
    assert(keptMid.size <= 2 && keptMid.nonEmpty)
  }

  test("format-version 3 without v3-only features reads; unknown versions fail loudly") {
    val dir = tmpDir()
    Manifest.write((1 to 10).toDF("v"), dir, "s1")
    IcebergExport.exportTable(spark, dir)
    val mj = new java.io.File(s"$dir/metadata/v1.metadata.json")
    val txt = scala.io.Source.fromFile(mj).mkString
    def setVersion(v: Int): Unit = {
      val w = new java.io.PrintWriter(mj)
      try w.write(txt.replaceAll(
        "\"format-version\"\\s*:\\s*2", s""""format-version" : $v"""))
      finally w.close()
      new java.io.File(s"$dir/metadata/.v1.metadata.json.crc").delete()
    }
    // round 11: a v3 tree whose only difference from v2 is the declared
    // version (no deletion vectors, no row lineage, no defaults) reads
    // byte-identical — the v3 deletion-vector subset
    setVersion(3)
    assert(IcebergExport.read(spark, dir).as[Int].collect().sorted.toSeq ==
      (1 to 10))
    // an UNKNOWN format version must still refuse loudly, never read
    // silently wrong
    setVersion(4)
    val ex = intercept[UnsupportedOperationException] {
      IcebergExport.read(spark, dir)
    }
    assert(ex.getMessage.contains("format-version"))
  }

  test("manifests without committed_at get a monotone fallback instant") {
    val dir = tmpDir()
    Manifest.write((1 to 10).toDF("v"), dir, "s1")
    Thread.sleep(15)
    Manifest.append((11 to 20).toDF("v"), dir, "s2")
    Thread.sleep(15)
    Manifest.append((21 to 30).toDF("v"), dir, "s3")
    // strip committed_at from the MIDDLE commit — pre-stamping
    // provenance. An export-time `now` fallback would stamp it AFTER
    // s3's real instant and break timestamp-ordered resolution.
    val mf = new java.io.File(s"$dir/manifest-1.json")
    val txt = scala.io.Source.fromFile(mf).mkString
    val stripped = txt.replaceAll("\"committed_at\"\\s*:\\s*\\d+,\\s*", "")
    assert(stripped != txt)
    val w = new java.io.PrintWriter(mf)
    try w.write(stripped) finally w.close()
    // the raw edit invalidates Hadoop LocalFS's sidecar checksum
    new java.io.File(s"$dir/.manifest-1.json.crc").delete()
    IcebergExport.exportTable(spark, dir)
    val meta = IcebergExport.currentMetadata(spark, dir)
    val JArray(log) = meta \ "snapshot-log"
    val times = log.map(e => { val JInt(t) = e \ "timestamp-ms"; t.toLong })
    assert(times == times.sorted, s"snapshot-log must be monotone: $times")
    // the unknown-instant snapshot INHERITS its predecessor's instant
    // (its true instant is >= it), never the export time
    assert(times(1) == times(0) && times(2) > times(1))
    // resolution is by MAX timestamp <= t: the newest real instant
    // resolves s3; just before it, the inherited-instant s2
    assert(IcebergExport.snapshotIdAsOf(spark, dir, times(2)) == 2L)
    assert(IcebergExport.snapshotIdAsOf(spark, dir, times(2) - 1) == 1L)
    assert(IcebergExport.readAsOf(spark, dir, times(2) - 1).count() == 20)
  }
}
