package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/**
 * FOREIGN-table import: logs hand-authored the way OTHER Delta writers
 * produce them — shuffled action-field orderings, optional fields
 * omitted (stats, commitInfo), unknown fields present (tags,
 * extendedFileMetadata) — must read byte-identical; logs using reader
 * features this engine lacks (minReaderVersion > 1, deletionVector on
 * an add, column mapping) must FAIL LOUDLY naming the feature, never
 * silently mis-read (a reader that ignored a deletionVector would
 * resurrect deleted rows). Iceberg's equivalent guard (equality
 * deletes, content=2) is covered here too.
 */
class ForeignDeltaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.session
  import spark.implicits._

  private def tmpDir() =
    java.nio.file.Files.createTempDirectory("foreigndelta").toString

  /** Land a one-part parquet under `dir` with an exact foreign-chosen
    * file name. */
  private def landParquet(df: DataFrame, dir: String, name: String): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("fdpart").toString + "/out"
    df.coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(fail(s"no part file under $tmp"))
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(dir, name))
  }

  private def writeCommit(dir: String, v: Long, lines: Seq[String]): Unit = {
    val ld = new java.io.File(dir, "_delta_log"); ld.mkdirs()
    val w = new java.io.PrintWriter(new java.io.File(ld, f"$v%020d.json"))
    try lines.foreach(w.println) finally w.close()
  }

  private def schemaJson(st: StructType): String =
    JsonMethods.compact(JsonMethods.render(JString(st.json)))

  private val intSchema = schemaJson(new StructType().add("v", "integer"))

  test("conformant foreign log reads byte-identical despite orderings and unknown fields") {
    val dir = tmpDir()
    landParquet((1 to 10).toDF("v"), dir, "a.parquet")
    landParquet((11 to 20).toDF("v"), dir, "b.parquet")
    landParquet((21 to 25).toDF("v"), dir, "c.parquet")
    // v0: fields in non-canonical order, an unknown tags field, NO
    // stats, NO commitInfo (it is optional)
    writeCommit(dir, 0L, Seq(
      s"""{"metaData":{"partitionColumns":[],"id":"foreign-1","schemaString":$intSchema,"format":{"provider":"parquet","options":{}},"configuration":{},"createdTime":5}}""",
      """{"protocol":{"minWriterVersion":2,"minReaderVersion":1}}""",
      """{"add":{"dataChange":true,"size":100,"path":"a.parquet","modificationTime":3,"partitionValues":{},"tags":{"writer":"other-engine"}}}""",
      """{"add":{"path":"b.parquet","partitionValues":{},"size":100,"modificationTime":3,"dataChange":true}}"""))
    // v1: a DELETE-shaped commit with unknown optional remove fields
    writeCommit(dir, 1L, Seq(
      """{"commitInfo":{"timestamp":123,"operation":"DELETE","operationParameters":{}}}""",
      """{"remove":{"path":"a.parquet","deletionTimestamp":5,"dataChange":true,"extendedFileMetadata":true}}""",
      """{"add":{"path":"c.parquet","partitionValues":{},"size":50,"modificationTime":9,"dataChange":true}}"""))

    assert(DeltaLog.read(spark, dir).as[Int].collect().sorted.toSeq ==
      (11 to 25))
    assert(DeltaLog.readVersion(spark, dir, 0L).count() == 20)
    // stats-free adds surface as None (keep-on-prune), never as "0 rows"
    assert(DeltaLog.activeFileStats(spark, dir) ==
      Seq("b.parquet" -> None, "c.parquet" -> None))
    assert(DeltaLog.prunedFiles(spark, dir, "v", "0", "1").sorted ==
      Seq("b.parquet", "c.parquet"))
    // v0 has no commitInfo: timestamp travel serves only v1
    assert(DeltaLog.versionTimestamps(spark, dir) == Seq(1L -> 123L))
    assert(DeltaLog.tableSchema(spark, dir).fieldNames.toSeq == Seq("v"))
  }

  test("unimplemented reader features fail loudly naming the feature") {
    val dir = tmpDir()
    landParquet((1 to 5).toDF("v"), dir, "a.parquet")
    writeCommit(dir, 0L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors","typeWidening"],"writerFeatures":["deletionVectors","typeWidening"]}}""",
      s"""{"metaData":{"id":"foreign-2","format":{"provider":"parquet","options":{}},"schemaString":$intSchema,"partitionColumns":[],"configuration":{},"createdTime":5}}""",
      """{"add":{"path":"a.parquet","partitionValues":{},"size":10,"modificationTime":1,"dataChange":true}}"""))
    val ex = intercept[UnsupportedOperationException] {
      DeltaLog.read(spark, dir)
    }
    assert(ex.getMessage.contains("typeWidening"))
    // deletionVectors alone is IMPLEMENTED: a features table declaring
    // only it reads fine
    val dir2 = tmpDir()
    landParquet((1 to 5).toDF("v"), dir2, "a.parquet")
    writeCommit(dir2, 0L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""",
      s"""{"metaData":{"id":"foreign-2b","format":{"provider":"parquet","options":{}},"schemaString":$intSchema,"partitionColumns":[],"configuration":{},"createdTime":5}}""",
      """{"add":{"path":"a.parquet","partitionValues":{},"size":10,"modificationTime":1,"dataChange":true}}"""))
    assert(DeltaLog.read(spark, dir2).count() == 5)
  }

  test("a protocol upgrade gates newer versions but not time travel below it") {
    val dir = tmpDir()
    landParquet((1 to 5).toDF("v"), dir, "a.parquet")
    writeCommit(dir, 0L, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"foreign-3","format":{"provider":"parquet","options":{}},"schemaString":$intSchema,"partitionColumns":[],"configuration":{},"createdTime":5}}""",
      """{"add":{"path":"a.parquet","partitionValues":{},"size":10,"modificationTime":1,"dataChange":true}}"""))
    writeCommit(dir, 1L, Seq(
      """{"commitInfo":{"timestamp":9,"operation":"UPGRADE PROTOCOL","operationParameters":{}}}""",
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["typeWidening"],"writerFeatures":["typeWidening"]}}"""))
    intercept[UnsupportedOperationException] { DeltaLog.read(spark, dir) }
    // the pre-upgrade version still reads (guards resolve AT the target)
    assert(DeltaLog.readVersion(spark, dir, 0L).count() == 5)
  }

  // ---- hand-authored deletion vectors, byte-by-byte per the PUBLIC
  // formats (delta PROTOCOL.md + RoaringFormatSpec) -------------------

  private val z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      ".-:+=^!/*?&<>()[]{}@%$#"

  private def z85Encode(bytes: Array[Byte]): String = {
    val padded = bytes ++ Array.fill((4 - bytes.length % 4) % 4)(0.toByte)
    padded.grouped(4).map { g =>
      var v = 0L
      g.foreach(b => v = (v << 8) | (b & 0xFF))
      (0 until 5).map(i =>
        z85Alphabet(((v / math.pow(85, 4 - i).toLong) % 85).toInt)).mkString
    }.mkString
  }

  /** Portable RoaringBitmapArray blob holding the given positions
    * (< 2^16, one bitmap, one array container) — authored raw. */
  private def bitmapArrayBytes(positions: Seq[Int]): Array[Byte] = {
    val n = positions.size
    val bb = java.nio.ByteBuffer
      .allocate(4 + 8 + 4 + 4 + 4 + 4 + 2 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(1681511377) // magic
    bb.putLong(1L) // one 32-bit bitmap
    bb.putInt(12346) // cookie: no run containers
    bb.putInt(1) // container count
    bb.putShort(0) // key
    bb.putShort((n - 1).toShort) // cardinality - 1
    bb.putInt(4 + 4 + 4 + 4) // offset header → container start
    positions.sorted.foreach(p => bb.putShort(p.toShort))
    bb.array()
  }

  /** Write a DV FILE (version byte, then at offset 1: big-endian
    * length, data, big-endian CRC-32) and return (z85 uuid, offset,
    * sizeInBytes). */
  private def writeDvFile(dir: String, positions: Seq[Int]): (String, Int, Int) = {
    val data = bitmapArrayBytes(positions)
    val uuid = java.util.UUID.randomUUID()
    val crc = new java.util.zip.CRC32; crc.update(data)
    val bb = java.nio.ByteBuffer.allocate(1 + 4 + data.length + 4)
    bb.put(1.toByte) // file format version
    bb.putInt(data.length) // big-endian length prefix
    bb.put(data)
    bb.putInt(crc.getValue.toInt) // big-endian CRC-32
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, s"deletion_vector_$uuid.bin"), bb.array())
    val uuidBytes = java.nio.ByteBuffer.allocate(16)
      .putLong(uuid.getMostSignificantBits)
      .putLong(uuid.getLeastSignificantBits).array()
    (z85Encode(uuidBytes), 1, data.length)
  }

  test("hand-authored deletion vectors decode and apply on the read path") {
    val dir = tmpDir()
    landParquet((1 to 5).toDF("v"), dir, "a.parquet")
    landParquet((6 to 9).toDF("v"), dir, "b.parquet")
    // file b: positions {0, 2} deleted via a DV FILE (storageType u)
    val (uuidZ85, off, size) = writeDvFile(dir, Seq(0, 2))
    // file a: position {1} deleted via an INLINE DV (storageType i)
    val inlineData = bitmapArrayBytes(Seq(1))
    val inline = z85Encode(inlineData)
    writeCommit(dir, 0L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""",
      s"""{"metaData":{"id":"foreign-4","format":{"provider":"parquet","options":{}},"schemaString":$intSchema,"partitionColumns":[],"configuration":{},"createdTime":5}}""",
      s"""{"add":{"path":"a.parquet","partitionValues":{},"size":10,"modificationTime":1,"dataChange":true,"deletionVector":{"storageType":"i","pathOrInlineDv":"$inline","sizeInBytes":${inlineData.length},"cardinality":1}}}""",
      s"""{"add":{"path":"b.parquet","partitionValues":{},"size":10,"modificationTime":1,"dataChange":true,"deletionVector":{"storageType":"u","pathOrInlineDv":"$uuidZ85","offset":$off,"sizeInBytes":$size,"cardinality":2}}}"""))
    // a loses row-index 1 (value 2), b loses 0 and 2 (values 6, 8)
    assert(DeltaLog.read(spark, dir).as[Int].collect().sorted.toSeq ==
      Seq(1, 3, 4, 5, 7, 9))
    assert(DeltaLog.readVersion(spark, dir, 0L).count() == 6)
    // the stats/partition collectors still refuse: their file lists
    // would silently misrepresent a DV table
    intercept[UnsupportedOperationException] {
      DeltaLog.activeFileStats(spark, dir)
    }
    intercept[UnsupportedOperationException] {
      DeltaLog.prunedFiles(spark, dir, "v", "0", "100")
    }
  }

  test("a 1.5M-position DV decodes executor-side and takes the shuffle anti-join path") {
    val dir = tmpDir()
    val n = 3000000L
    landParquet(spark.range(0, n).toDF("v"), dir, "big.parquet")
    // 1.5M deleted positions (every even row) — far past the inline /
    // broadcast regime. The bitmap bytes come from the engine's own
    // codec (round-trip-proven against the hand-authored raw format in
    // DeletionVectorSpec and the cases above); the POINT here is scale:
    // the descriptor's cardinality exceeds MaxBroadcastDvPositions, so
    // the decode must run inside Spark tasks and the anti-join must
    // shuffle — the driver never holds a per-deleted-row tuple.
    val positions = (0L until n by 2L).toVector
    val d = DeletionVector.writeDvFile(spark, dir, positions)
    writeCommit(dir, 0L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""",
      s"""{"metaData":{"id":"foreign-dv-big","format":{"provider":"parquet","options":{}},"schemaString":${schemaJson(new StructType().add("v", "long"))},"partitionColumns":[],"configuration":{},"createdTime":5}}""",
      s"""{"add":{"path":"big.parquet","partitionValues":{},"size":10,"modificationTime":1,"dataChange":true,"deletionVector":{"storageType":"u","pathOrInlineDv":"${d.pathOrInlineDv}","offset":${d.offset},"sizeInBytes":${d.sizeInBytes},"cardinality":${d.cardinality}}}}"""))
    // frame construction (log replay) happens OUTSIDE the job group;
    // only the scan + DV decode + anti-join run inside it — proving the
    // positions are born in executor tasks, not on the driver
    val df = DeltaLog.read(spark, dir)
    spark.sparkContext.setJobGroup("graft-dv-decode", "distributed DV decode", false)
    val kept = try df.count() finally spark.sparkContext.clearJobGroup()
    assert(spark.sparkContext.statusTracker
      .getJobIdsForGroup("graft-dv-decode").nonEmpty,
      "DV application must run as Spark jobs")
    assert(kept == n / 2)
    // spot-check row-level correctness: only odd values survive
    assert(df.where("v % 2 = 0").count() == 0)
    assert(df.where("v IN (1, 1500001, 2999999)").count() == 3)
  }

  test("a corrupt deletion vector fails loudly, never drops rows silently") {
    val dir = tmpDir()
    landParquet((1 to 5).toDF("v"), dir, "a.parquet")
    val (uuidZ85, off, size) = writeDvFile(dir, Seq(0))
    // flip one data byte INSIDE the stored blob → CRC must catch it
    val f = new java.io.File(dir).listFiles
      .find(_.getName.startsWith("deletion_vector_")).get
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    bytes(7) = (bytes(7) ^ 0x01).toByte
    java.nio.file.Files.write(f.toPath, bytes)
    writeCommit(dir, 0L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""",
      s"""{"metaData":{"id":"foreign-4c","format":{"provider":"parquet","options":{}},"schemaString":$intSchema,"partitionColumns":[],"configuration":{},"createdTime":5}}""",
      s"""{"add":{"path":"a.parquet","partitionValues":{},"size":10,"modificationTime":1,"dataChange":true,"deletionVector":{"storageType":"u","pathOrInlineDv":"$uuidZ85","offset":$off,"sizeInBytes":$size,"cardinality":1}}}"""))
    val ex = intercept[Exception] { DeltaLog.read(spark, dir).count() }
    assert(ex.getMessage.contains("checksum") || ex.getMessage.contains("magic"),
      s"corruption must surface loudly: ${ex.getMessage}")
  }

  test("column-mapped tables read through physical names; pruning translates " +
      "logical lookups; raw physical surfaces still refuse") {
    import org.apache.spark.sql.types.{IntegerType, MetadataBuilder, StructField, StructType}
    val dir = tmpDir()
    // the parquet files carry PHYSICAL column names (id-mode shape,
    // hyphenated), as foreign mapped writers produce; stats keys and
    // partitionValues in the log are keyed by the same physical names
    landParquet((1 to 5).toDF("col-9f8ab"), dir, "a.parquet")
    landParquet((100 to 105).toDF("col-9f8ab"), dir, "b.parquet")
    val mb = new MetadataBuilder()
      .putLong("delta.columnMapping.id", 1L)
      .putString("delta.columnMapping.physicalName", "col-9f8ab").build()
    val cmSchema = schemaJson(StructType(Seq(
      StructField("v", IntegerType, nullable = true, mb))))
    writeCommit(dir, 0L, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      s"""{"metaData":{"id":"foreign-5","format":{"provider":"parquet","options":{}},"schemaString":$cmSchema,"partitionColumns":[],"configuration":{"delta.columnMapping.mode":"name"},"createdTime":5}}""",
      """{"add":{"path":"a.parquet","partitionValues":{},"size":10,"modificationTime":1,"dataChange":true,"stats":"{\"numRecords\":5,\"minValues\":{\"col-9f8ab\":1},\"maxValues\":{\"col-9f8ab\":5},\"nullCount\":{\"col-9f8ab\":0}}"}}""",
      """{"add":{"path":"b.parquet","partitionValues":{},"size":10,"modificationTime":1,"dataChange":true,"stats":"{\"numRecords\":6,\"minValues\":{\"col-9f8ab\":100},\"maxValues\":{\"col-9f8ab\":105},\"nullCount\":{\"col-9f8ab\":0}}"}}"""))
    // the full-table read path maps physical → LOGICAL names
    import spark.implicits._
    val df = DeltaLog.read(spark, dir)
    assert(df.columns.toSeq == Seq("v"))
    assert(df.as[Int].collect().sorted.toSeq == ((1 to 5) ++ (100 to 105)))
    // stats skipping translates the LOGICAL column to its physical
    // stats key: the query [0,3] keeps only a.parquet
    assert(DeltaLog.prunedFiles(spark, dir, "v", "0", "3") == Seq("a.parquet"))
    val pruned = DeltaLog.readPruned(spark, dir, "v", "0", "3")
    assert(pruned.columns.toSeq == Seq("v"))
    assert(pruned.as[Int].collect().sorted.toSeq == (1 to 5))
    // partition pruning translates keys likewise (unpartitioned here:
    // a no-match prune returns empty WITH the logical schema)
    assert(DeltaLog.readPartitionPruned(spark, dir, Map("v" -> "1"))
      .columns.toSeq == Seq("v"))
    // the RAW surfaces still refuse loudly: they return physical stats
    // keys / partitionValues verbatim, which a logical caller would
    // silently misresolve
    intercept[UnsupportedOperationException] {
      DeltaLog.activeFileStats(spark, dir)
    }
  }

  test("timestampNtz tables read zone-free with the declared NTZ type") {
    import org.apache.spark.sql.types.{StructType, TimestampNTZType}
    val dir = tmpDir()
    // values that WOULD shift if anything resolved them through a zone:
    // wall-clock instants around a DST boundary, written as parquet
    // TIMESTAMP(isAdjustedToUTC=false)
    val df = spark.sql(
      """SELECT timestamp_ntz'2024-03-31 01:30:00' AS ts, 1 AS v
        |UNION ALL
        |SELECT timestamp_ntz'2024-03-31 03:30:00', 2""".stripMargin)
    assert(df.schema("ts").dataType == TimestampNTZType)
    landParquet(df, dir, "a.parquet")
    val ntzSchema = schemaJson(StructType(Seq(
      org.apache.spark.sql.types.StructField("ts", TimestampNTZType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.IntegerType))))
    writeCommit(dir, 0L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["timestampNtz"],"writerFeatures":["timestampNtz"]}}""",
      s"""{"metaData":{"id":"foreign-ntz","format":{"provider":"parquet","options":{}},"schemaString":$ntzSchema,"partitionColumns":[],"configuration":{},"createdTime":7}}""",
      """{"add":{"path":"a.parquet","partitionValues":{},"size":10,"modificationTime":1,"dataChange":true}}"""))
    val got = DeltaLog.read(spark, dir)
    assert(got.schema("ts").dataType == TimestampNTZType)
    assert(got.orderBy("v").select("ts").collect()
      .map(_.getAs[java.time.LocalDateTime](0).toString).toSeq ==
      Seq("2024-03-31T01:30", "2024-03-31T03:30"),
      "NTZ wall-clock values must read back unshifted")
    assert(DeltaLog.tableSchema(spark, dir)("ts").dataType == TimestampNTZType)
    // an UNKNOWN feature alongside it still refuses by name
    val dir2 = tmpDir()
    landParquet(df, dir2, "a.parquet")
    writeCommit(dir2, 0L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["timestampNtz","typeWidening"]}}""",
      s"""{"metaData":{"id":"x","format":{"provider":"parquet","options":{}},"schemaString":$ntzSchema,"partitionColumns":[],"configuration":{},"createdTime":7}}""",
      """{"add":{"path":"a.parquet","partitionValues":{},"size":10,"modificationTime":1,"dataChange":true}}"""))
    val ex = intercept[UnsupportedOperationException](
      DeltaLog.read(spark, dir2).count())
    assert(ex.getMessage.contains("typeWidening"))
  }

  // ---- hand-authored V2 CHECKPOINTS (the modern delta-spark writer
  // default: UUID-named manifest + _sidecars/*.parquet) ---------------

  private def v2ManifestSchema(withAdd: Boolean): StructType = {
    import org.apache.spark.sql.types._
    val protocolT = StructType(Seq(
      StructField("minReaderVersion", IntegerType),
      StructField("minWriterVersion", IntegerType),
      StructField("readerFeatures", ArrayType(StringType)),
      StructField("writerFeatures", ArrayType(StringType))))
    val metaT = StructType(Seq(
      StructField("id", StringType),
      StructField("format", StructType(Seq(
        StructField("provider", StringType),
        StructField("options", MapType(StringType, StringType))))),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType)),
      StructField("configuration", MapType(StringType, StringType)),
      StructField("createdTime", LongType)))
    val ckptMetaT = StructType(Seq(StructField("version", LongType)))
    val sidecarT = StructType(Seq(
      StructField("path", StringType),
      StructField("sizeInBytes", LongType),
      StructField("modificationTime", LongType)))
    val base = StructType(Seq(
      StructField("protocol", protocolT),
      StructField("metaData", metaT),
      StructField("checkpointMetadata", ckptMetaT),
      StructField("sidecar", sidecarT)))
    if (withAdd) StructType(base.fields :+ StructField("add", addActionT))
    else base
  }

  private val addActionT: StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("dataChange", org.apache.spark.sql.types.BooleanType),
      StructField("stats", StringType)))
  }

  private def addRow(path: String): org.apache.spark.sql.Row =
    org.apache.spark.sql.Row(path, Map.empty[String, String], 10L, 1L, true, null)

  private def metaRow(id: String): org.apache.spark.sql.Row =
    org.apache.spark.sql.Row(id, org.apache.spark.sql.Row("parquet",
      Map.empty[String, String]),
      new StructType().add("v", "integer").json,
      Seq.empty[String], Map.empty[String, String], 5L)

  private def protoRow: org.apache.spark.sql.Row =
    org.apache.spark.sql.Row(3, 7, Seq("v2Checkpoint"), Seq("v2Checkpoint"))

  /** Write rows as ONE parquet file at the exact foreign-chosen name. */
  private def writeOneParquet(rows: Seq[org.apache.spark.sql.Row],
      schema: StructType, dest: java.io.File): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("v2ck").toString + "/out"
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(fail(s"no part under $tmp"))
    dest.getParentFile.mkdirs()
    java.nio.file.Files.move(part.toPath, dest.toPath)
  }

  test("v2 checkpoint with sidecars reconstructs; later commits fold forward") {
    val dir = tmpDir()
    landParquet((1 to 10).toDF("v"), dir, "a.parquet")
    landParquet((11 to 20).toDF("v"), dir, "b.parquet")
    landParquet((21 to 25).toDF("v"), dir, "c.parquet")
    val ld = new java.io.File(dir, "_delta_log"); ld.mkdirs()
    // two sidecars, one add each (the split shape delta-spark writes)
    val sideSchema = StructType(Seq(
      org.apache.spark.sql.types.StructField("add", addActionT)))
    writeOneParquet(Seq(org.apache.spark.sql.Row(addRow("a.parquet"))),
      sideSchema, new java.io.File(ld, "_sidecars/s-aaaa.parquet"))
    writeOneParquet(Seq(org.apache.spark.sql.Row(addRow("b.parquet"))),
      sideSchema, new java.io.File(ld, "_sidecars/s-bbbb.parquet"))
    def sz(n: String) = new java.io.File(ld, s"_sidecars/$n").length()
    // UUID-named manifest: protocol + metaData + checkpointMetadata +
    // sidecar pointers, NO add column at all
    val mSchema = v2ManifestSchema(withAdd = false)
    writeOneParquet(Seq(
      org.apache.spark.sql.Row(protoRow, null, null, null),
      org.apache.spark.sql.Row(null, metaRow("foreign-v2ck"), null, null),
      org.apache.spark.sql.Row(null, null, org.apache.spark.sql.Row(1L), null),
      org.apache.spark.sql.Row(null, null, null,
        org.apache.spark.sql.Row("s-aaaa.parquet", sz("s-aaaa.parquet"), 1L)),
      org.apache.spark.sql.Row(null, null, null,
        org.apache.spark.sql.Row("s-bbbb.parquet", sz("s-bbbb.parquet"), 1L))),
      mSchema, new java.io.File(ld,
        "00000000000000000001.checkpoint.80a083e8-7026-4e79-81be-64bd76c43a11.parquet"))
    val lcw = new java.io.PrintWriter(new java.io.File(ld, "_last_checkpoint"))
    try lcw.write("""{"version":1,"size":5}""") finally lcw.close()
    // a later commit folds forward over the reconstructed state
    writeCommit(dir, 2L, Seq(
      """{"commitInfo":{"timestamp":123,"operation":"WRITE","operationParameters":{}}}""",
      """{"add":{"path":"c.parquet","partitionValues":{},"size":10,"modificationTime":9,"dataChange":true}}"""))

    assert(DeltaLog.read(spark, dir).as[Int].collect().sorted.toSeq == (1 to 25))
    assert(DeltaLog.activeFiles(spark, dir).sorted ==
      Seq("a.parquet", "b.parquet", "c.parquet"))
    assert(DeltaLog.tableSchema(spark, dir).fieldNames.toSeq == Seq("v"))
    // a missing sidecar is a LOUD error, never a silent half-state
    assert(new java.io.File(ld, "_sidecars/s-bbbb.parquet").delete())
    new java.io.File(ld, "_sidecars/.s-bbbb.parquet.crc").delete()
    val ex = intercept[IllegalArgumentException] { DeltaLog.read(spark, dir) }
    assert(ex.getMessage.contains("sidecar"))
  }

  test("v2 checkpoint with inline adds (sidecar column present, no sidecar files)") {
    val dir = tmpDir()
    landParquet((1 to 10).toDF("v"), dir, "a.parquet")
    val ld = new java.io.File(dir, "_delta_log"); ld.mkdirs()
    val mSchema = v2ManifestSchema(withAdd = true)
    writeOneParquet(Seq(
      org.apache.spark.sql.Row(protoRow, null, null, null, null),
      org.apache.spark.sql.Row(null, metaRow("foreign-v2ck-inline"), null, null, null),
      org.apache.spark.sql.Row(null, null, org.apache.spark.sql.Row(3L), null, null),
      org.apache.spark.sql.Row(null, null, null, null, addRow("a.parquet"))),
      mSchema, new java.io.File(ld,
        "00000000000000000003.checkpoint.1b7e95f1-4d3f-44e7-b3e9-0c6c9f62a001.parquet"))
    val lcw = new java.io.PrintWriter(new java.io.File(ld, "_last_checkpoint"))
    try lcw.write("""{"version":3,"size":4}""") finally lcw.close()
    writeCommit(dir, 4L, Seq(
      """{"commitInfo":{"timestamp":5,"operation":"WRITE","operationParameters":{}}}"""))
    assert(DeltaLog.read(spark, dir).as[Int].collect().sorted.toSeq == (1 to 10))
  }

  test("v2 checkpoint with a JSON manifest (line-framed actions) reconstructs") {
    val dir = tmpDir()
    landParquet((1 to 10).toDF("v"), dir, "a.parquet")
    landParquet((11 to 20).toDF("v"), dir, "b.parquet")
    val ld = new java.io.File(dir, "_delta_log"); ld.mkdirs()
    // one sidecar holding both adds
    val sideSchema = StructType(Seq(
      org.apache.spark.sql.types.StructField("add", addActionT)))
    writeOneParquet(Seq(
      org.apache.spark.sql.Row(addRow("a.parquet")),
      org.apache.spark.sql.Row(addRow("b.parquet"))),
      sideSchema, new java.io.File(ld, "_sidecars/s-json.parquet"))
    // the spec-legal JSON manifest shape delta-spark's json-manifest
    // config writes: `<v>.checkpoint.<uuid>.json`, line-framed actions
    val mw = new java.io.PrintWriter(new java.io.File(ld,
      "00000000000000000001.checkpoint.55aa0e0e-1111-4e79-81be-64bd76c43a22.json"))
    try {
      mw.println("""{"checkpointMetadata":{"version":1}}""")
      mw.println("""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["v2Checkpoint"],"writerFeatures":["v2Checkpoint"]}}""")
      mw.println(s"""{"metaData":{"id":"foreign-v2ck-json","format":{"provider":"parquet","options":{}},"schemaString":${JsonMethods.compact(JsonMethods.render(JString(new StructType().add("v", "integer").json)))},"partitionColumns":[],"configuration":{},"createdTime":5}}""")
      mw.println(s"""{"sidecar":{"path":"s-json.parquet","sizeInBytes":${new java.io.File(ld, "_sidecars/s-json.parquet").length()},"modificationTime":1}}""")
    } finally mw.close()
    val lcw = new java.io.PrintWriter(new java.io.File(ld, "_last_checkpoint"))
    try lcw.write("""{"version":1,"size":4}""") finally lcw.close()
    // a later plain commit folds forward over the JSON-manifest state
    landParquet((21 to 25).toDF("v"), dir, "c.parquet")
    writeCommit(dir, 2L, Seq(
      """{"commitInfo":{"timestamp":123,"operation":"WRITE","operationParameters":{}}}""",
      """{"add":{"path":"c.parquet","partitionValues":{},"size":10,"modificationTime":9,"dataChange":true}}"""))
    assert(DeltaLog.read(spark, dir).as[Int].collect().sorted.toSeq == (1 to 25))
    assert(DeltaLog.activeFiles(spark, dir).sorted ==
      Seq("a.parquet", "b.parquet", "c.parquet"))
    assert(DeltaLog.tableSchema(spark, dir).fieldNames.toSeq == Seq("v"))
  }

  test("foreign CDF: cdc actions with relative/absolute paths and action partitionValues") {
    val dir = tmpDir()
    val absDir = tmpDir()
    // delta-spark's partitioned cdc shape: `_change_data` files carry
    // the table columns + `_change_type` but NOT the partition column —
    // its value lives in the cdc action's partitionValues
    new java.io.File(dir, "_change_data").mkdirs()
    landParquet(
      Seq((5, "update_preimage"), (50, "update_postimage"))
        .toDF("v", "_change_type"),
      s"$dir/_change_data", "cdcx.parquet")
    // a second cdc file referenced by ABSOLUTE URI, different partition
    landParquet(Seq((9, "delete")).toDF("v", "_change_type"),
      absDir, "cdcy.parquet")
    landParquet(Seq(5).toDF("v"), dir, "a.parquet")
    landParquet(Seq(50).toDF("v"), dir, "d.parquet")
    val partSchema = schemaJson(
      new StructType().add("v", "integer").add("seg", "string"))
    writeCommit(dir, 0L, Seq(
      s"""{"metaData":{"id":"foreign-cdf","schemaString":$partSchema,"format":{"provider":"parquet","options":{}},"partitionColumns":["seg"],"configuration":{"delta.enableChangeDataFeed":"true"},"createdTime":5}}""",
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":4}}""",
      """{"add":{"path":"a.parquet","partitionValues":{"seg":"x"},"size":100,"modificationTime":3,"dataChange":true}}"""))
    // v1: an UPDATE+DELETE commit — cdc actions supersede add/remove
    writeCommit(dir, 1L, Seq(
      """{"commitInfo":{"timestamp":456,"operation":"MERGE"}}""",
      """{"remove":{"path":"a.parquet","deletionTimestamp":9,"dataChange":true}}""",
      """{"add":{"path":"d.parquet","partitionValues":{"seg":"x"},"size":100,"modificationTime":9,"dataChange":true}}""",
      s"""{"cdc":{"path":"_change_data/cdcx.parquet","partitionValues":{"seg":"x"},"size":10,"dataChange":false}}""",
      s"""{"cdc":{"path":"file:$absDir/cdcy.parquet","partitionValues":{"seg":"y"},"size":10,"dataChange":false}}"""))
    // v2: a plain partitioned APPEND (no cdc actions) whose add carries
    // partitionValues while the FILE lacks the partition column (the
    // protocol's physical layout) — the derived insert must attach the
    // typed value, and an absolute add URI must resolve
    landParquet(Seq(77).toDF("v"), dir, "e.parquet")
    landParquet(Seq(88).toDF("v"), absDir, "f.parquet")
    writeCommit(dir, 2L, Seq(
      """{"commitInfo":{"timestamp":789,"operation":"WRITE"}}""",
      """{"add":{"path":"e.parquet","partitionValues":{"seg":"z"},"size":100,"modificationTime":9,"dataChange":true}}""",
      s"""{"add":{"path":"file:$absDir/f.parquet","partitionValues":{"seg":"w"},"size":100,"modificationTime":9,"dataChange":true}}"""))
    val got = DeltaLog.readChanges(spark, dir, 0L)
      .select("v", "seg", "_change_type", "_commit_version")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sorted.toSeq
    assert(got == Seq(
      (5, "x", "update_preimage", 1L),
      (9, "y", "delete", 1L),
      (50, "x", "update_postimage", 1L),
      (77, "z", "insert", 2L),
      (88, "w", "insert", 2L)),
      s"foreign cdc + add commits must read change-for-change, got $got")
  }

  test("percent-encoded action paths decode before resolving (delta-spark parity)") {
    val dir = tmpDir()
    // foreign writers percent-encode action paths (the protocol's URI
    // serialization): a file NAMED with a space is logged as %20
    landParquet((1 to 10).toDF("v"), dir, "part a.parquet")
    landParquet((11 to 15).toDF("v"), dir, "plain.parquet")
    writeCommit(dir, 0L, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"foreign-enc","format":{"provider":"parquet","options":{}},"schemaString":$intSchema,"partitionColumns":[],"configuration":{},"createdTime":5}}""",
      """{"add":{"path":"part%20a.parquet","partitionValues":{},"size":10,"modificationTime":1,"dataChange":true}}""",
      """{"add":{"path":"plain.parquet","partitionValues":{},"size":10,"modificationTime":1,"dataChange":true}}"""))
    assert(DeltaLog.read(spark, dir).as[Int].collect().sorted.toSeq ==
      (1 to 15), "encoded add paths must decode before the scan")
    // the incremental face decodes too
    landParquet(Seq(99).toDF("v"), dir, "enc oded.parquet")
    writeCommit(dir, 1L, Seq(
      """{"commitInfo":{"timestamp":456,"operation":"WRITE"}}""",
      """{"add":{"path":"enc%20oded.parquet","partitionValues":{},"size":10,"modificationTime":2,"dataChange":true}}"""))
    assert(DeltaLog.readChanges(spark, dir, 0L)
      .select("v").as[Int].collect().toSeq == Seq(99))
  }

  test("DV-carrying adds in a partitioned commit keep action partitionValues in the change feed") {
    val dir = tmpDir()
    val partSchema = schemaJson(
      new StructType().add("v", "integer").add("seg", "string"))
    landParquet(Seq(1, 2, 3).toDF("v"), dir, "a.parquet")
    writeCommit(dir, 0L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""",
      s"""{"metaData":{"id":"foreign-dvpv","format":{"provider":"parquet","options":{}},"schemaString":$partSchema,"partitionColumns":["seg"],"configuration":{},"createdTime":5}}""",
      """{"add":{"path":"a.parquet","partitionValues":{"seg":"x"},"size":10,"modificationTime":1,"dataChange":true}}"""))
    // v1: a partitioned append whose add carries BOTH a deletion vector
    // (row-index 1 deleted) and partitionValues for a column the file
    // lacks — the derived inserts must attach seg (ADVICE r11: the DV
    // branch silently emitted NULL partition columns)
    landParquet(Seq(10, 11, 12).toDF("v"), dir, "b.parquet")
    val inlineData = bitmapArrayBytes(Seq(1))
    val inline = z85Encode(inlineData)
    writeCommit(dir, 1L, Seq(
      """{"commitInfo":{"timestamp":456,"operation":"WRITE"}}""",
      s"""{"add":{"path":"b.parquet","partitionValues":{"seg":"y"},"size":10,"modificationTime":2,"dataChange":true,"deletionVector":{"storageType":"i","pathOrInlineDv":"$inline","sizeInBytes":${inlineData.length},"cardinality":1}}}"""))
    val got = DeltaLog.readChanges(spark, dir, 0L)
      .select("v", "seg", "_change_type", "_commit_version")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sorted.toSeq
    assert(got == Seq((10, "y", "insert", 1L), (12, "y", "insert", 1L)),
      s"DV adds must keep their action partition values, got $got")
  }

  test("iceberg equality deletes (content=2) fail loudly") {
    import scala.jdk.CollectionConverters._
    import org.apache.avro.file.{DataFileStream, DataFileWriter}
    import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
    import org.apache.spark.sql.functions.col
    val dir = tmpDir()
    Manifest.write(spark.range(0, 100).toDF("id")
      .repartitionByRange(2, col("id")), dir, "base")
    Manifest.deleteRangeMOR(spark, dir, "id", "10", "19", "mor1")
    IcebergExport.exportTable(spark, dir)
    // the exported table carries POSITION deletes (content=1): reads work
    assert(IcebergExport.read(spark, dir).count() == 90)
    // simulate a FOREIGN writer: rewrite the delete manifest's entries
    // with content=2 (EQUALITY deletes) in place
    val delManifest = new java.io.File(s"$dir/metadata")
      .listFiles.find(_.getName.endsWith("-m1-deletes.avro"))
      .getOrElse(fail("no delete manifest exported"))
    val in = new java.io.FileInputStream(delManifest)
    val rd = new DataFileStream[GenericRecord](in,
      new GenericDatumReader[GenericRecord]())
    val (schema, metaKeys, recs) =
      try {
        val ks = rd.getMetaKeys.asScala.toSeq
          .map(k => k -> rd.getMetaString(k))
        (rd.getSchema, ks, rd.iterator().asScala.toVector)
      } finally rd.close()
    recs.foreach(_.get("data_file").asInstanceOf[GenericRecord].put("content", 2))
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    metaKeys.foreach { case (k, v) =>
      if (!k.startsWith("avro.")) w.setMeta(k, v) }
    w.create(schema, delManifest)
    recs.foreach(w.append); w.close()
    new java.io.File(s"$dir/metadata/.${delManifest.getName}.crc").delete()
    val ex = intercept[UnsupportedOperationException] {
      IcebergExport.read(spark, dir)
    }
    assert(ex.getMessage.contains("EQUALITY") &&
      ex.getMessage.contains("content=2"))
  }
}
