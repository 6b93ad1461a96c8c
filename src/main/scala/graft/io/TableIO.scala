package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * Staged-zone file IO. Tables are files under a prefix, flowing through
 * zones with defined mutability (reference README.md:21-123; SURVEY.md
 * §1.1): land (transient, as-received), raw-hist (immutable append-only
 * history), processed (transient), curated (idempotent full rebuild,
 * parquet). Paths are URI-agnostic — posix for tests, s3a:// etc. in
 * production, same code.
 */
final case class Zones(land: String, rawHist: String, processed: String, curated: String)

object TableIO {

  /** Ingest-time partition column used across land/raw-hist
    * (reference write_data_to_land.py:42, README.md:32-50). */
  val LandTimestampCol = "file_land_timestamp"

  def landPartitionPath(zoneBase: String, table: String, landTimestamp: Long): String =
    s"${zoneBase.stripSuffix("/")}/$table/$LandTimestampCol=$landTimestamp"

  private def fs(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  // ---- scans -------------------------------------------------------------

  /** JSONL scan, gzip auto-detected, Hive-style partition discovery +
    * implicit UNION ALL of all historical partitions (reference job.py:39;
    * SURVEY.md §2.1 O7/O11). Schema: declared if given, else inferred. */
  def readJson(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).json(path)
  }

  def readParquet(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)

  /** PERMISSIVE JSONL scan with quarantine: malformed lines neither kill
    * the job (FAILFAST) nor silently vanish (DROPMALFORMED) — they come
    * back as a second frame of raw lines for a quarantine zone, the
    * batch-tolerant sibling of the validate-stage gates (reference
    * test_data.py:41-54 accumulates errors rather than dying on the
    * first). The parsed frame is checkpointed lazily because Spark
    * disallows scans that would read ONLY the corrupt-record column.
    * Returns (good rows in declared schema, corrupt raw lines). */
  def readJsonQuarantine(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.col
    val withCorrupt = schema.add("_corrupt_record", org.apache.spark.sql.types.StringType)
    val raw = spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .localCheckpoint(false)
    val good = raw.filter(col("_corrupt_record").isNull).drop("_corrupt_record")
    val bad = raw.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw_line"))
    (good, bad)
  }

  /** Enumerate data files under a table prefix, recursively (reference
    * test_data.py:25 get_filepaths_from_s3_folder; SURVEY.md §2.1 O6).
    * Hidden-ness applies to EVERY path component below the prefix, not
    * just the leaf: files inside `_staging_*`/`_spark_metadata`/`.tmp`
    * directories are in-progress or bookkeeping state and must never be
    * served to readers (a leaf-name-only filter leaked half-written
    * Avro staging files to concurrent readers). */
  def listDataFiles(spark: SparkSession, path: String): Seq[String] = {
    val (filesystem, p) = fs(spark, path)
    if (!filesystem.exists(p)) Nil
    else {
      val prefix = filesystem.getFileStatus(p).getPath.toString.stripSuffix("/") + "/"
      val it = filesystem.listFiles(p, true)
      val buf = Seq.newBuilder[String]
      while (it.hasNext) {
        val f = it.next()
        val full = f.getPath.toString
        val rel = if (full.startsWith(prefix)) full.stripPrefix(prefix) else f.getPath.getName
        val hidden = rel.split('/')
          .exists(seg => seg.startsWith("_") || seg.startsWith("."))
        if (f.isFile && !hidden) buf += full
      }
      buf.result().sorted
    }
  }

  // ---- sinks -------------------------------------------------------------

  /** JSONL.gz sink (reference custom_functions.py:21-28; O4). `singleFile`
    * mirrors the reference's one-object-per-batch layout; at scale leave it
    * false and let every task write its own ≤1 GB chunk (README.md:655-657). */
  def writeJsonlGz(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode(SaveMode.Overwrite).option("compression", "gzip").json(path)
  }

  /** Idempotent whole-table rebuild (reference job.py:63, README.md:307;
    * O18). `maxRecordsPerFile` keeps objects chunked for parallel scans. */
  def writeParquetOverwrite(df: DataFrame, path: String, maxRecordsPerFile: Long = 0L): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    val w2 = if (maxRecordsPerFile > 0) w.option("maxRecordsPerFile", maxRecordsPerFile) else w
    w2.parquet(path)
  }

  /** Write a snapshot into one explicit Hive-style partition directory,
    * format taken from metadata (reference job.py:67-73; O19). The frame
    * must already have the partition column dropped (Align.alignToMeta).
    * `avro` in table metadata routes through the engine's own DSv2 face
    * (no spark-avro module on this classpath). */
  def writeIntoPartition(
      df: DataFrame,
      tableBase: String,
      partitionCol: String,
      partitionValue: String,
      format: String = "parquet"): Unit = {
    val path = s"${tableBase.stripSuffix("/")}/$partitionCol=$partitionValue"
    val fmt = if (format == "avro") "graft.sources.AvroSourceV2" else format
    df.write.mode(SaveMode.Overwrite).format(fmt).save(path)
  }

  /** Partition-aware overwrite for incremental rebuilds: only partitions
    * present in `df` are replaced (dynamic partition overwrite — the
    * open-source escape hatch the reference notes Glue lacked,
    * README.md:637). */
  def writePartitionedDynamic(df: DataFrame, path: String, partitionCols: Seq[String], format: String = "parquet"): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .format(format)
      .save(path)

  /** CSV scan with declared schema (never inferSchema at scale — inference
    * is a full extra pass over the data) and the header/permissive options
    * an edge-zone ingest needs. */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** CSV sink (header on, so the file round-trips through readCsv). */
  def writeCsv(df: DataFrame, path: String, header: Boolean = true,
      delimiter: String = ","): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .csv(path)

  /** ORC scan/sink — the other columnar format a lake ingests from. */
  def readOrc(spark: SparkSession, path: String): DataFrame = spark.read.orc(path)
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /**
   * Small-file compaction: rewrite a parquet directory into
   * ceil(bytes/targetFileBytes) files. The many-tiny-files shape is the
   * chronic failure mode of micro-batch ingest (the reference's ≤1 GB
   * guidance, README.md:655-657, is the same concern from the other side):
   * at 100 TB, scan parallelism and S3 listing both degrade with file
   * count, so zones get compacted on a schedule. Writes to a fresh
   * directory and swaps via two renames — a reader sees the old files or
   * the new ones, never a mix; the instant between the renames is the
   * residual race that table formats close with a manifest commit, which
   * is why at 100 TB this op belongs inside a maintenance window (the
   * reference's read-write-overlap rule, README.md:619-637).
   */
  def compactDir(spark: SparkSession, dir: String, targetFileBytes: Long): Long = {
    val (fsys, p) = fs(spark, dir)
    val bytes = fsys.getContentSummary(p).getLength
    val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    val tmp = new Path(p.getParent, s".${p.getName}.compact.tmp")
    spark.read.parquet(dir).repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val bak = new Path(p.getParent, s".${p.getName}.compact.old")
    if (fsys.exists(bak)) fsys.delete(bak, true)
    // Hadoop FileSystem.rename reports failure by RETURNING false — check
    // both renames, and roll the first back if the second fails, so the
    // zone is never left missing while the caller sees success
    if (!fsys.rename(p, bak))
      throw new java.io.IOException(s"compactDir: rename $p -> $bak failed")
    if (!fsys.rename(tmp, p)) {
      fsys.rename(bak, p) // restore the original zone
      throw new java.io.IOException(s"compactDir: rename $tmp -> $p failed (original restored)")
    }
    fsys.delete(bak, true)
    nFiles.toLong
  }

  /** Bucketed + sorted managed table: co-locates and pre-sorts rows by the
    * join/agg key so later equi-joins between two tables bucketed on the
    * same key run with NO shuffle and NO sort — the physical-layout
    * investment that pays for itself at 100 TB where a fact-fact shuffle
    * is the dominant cost. Requires the session catalog (bucketBy only
    * writes through saveAsTable). */
  def writeBucketedTable(
      df: DataFrame,
      tableName: String,
      bucketCols: Seq[String],
      numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(tableName)

  // ---- promotion ---------------------------------------------------------

  /** Validated promotion land → raw-hist: byte-identical copy then delete
    * source — deliberately a copy, not a re-serialization (reference
    * test_data.py:56-60; README.md:289; O10). Immutability of raw-hist is
    * the reproducibility anchor (README.md:30). */
  def promote(spark: SparkSession, srcDir: String, dstDir: String): Unit = {
    val conf: Configuration = spark.sparkContext.hadoopConfiguration
    val (srcFs, src) = fs(spark, srcDir)
    val (dstFs, dst) = fs(spark, dstDir)
    if (!srcFs.exists(src)) throw new IllegalArgumentException(s"promote: source missing: $srcDir")
    dstFs.mkdirs(dst.getParent)
    val ok = FileUtil.copy(srcFs, src, dstFs, dst, /*deleteSource=*/ false, /*overwrite=*/ true, conf)
    if (!ok) throw new RuntimeException(s"promote: copy failed $srcDir -> $dstDir")
    srcFs.delete(src, true) // land is transient (README.md:23-26)
  }

  def deleteDir(spark: SparkSession, dir: String): Unit = {
    val (filesystem, p) = fs(spark, dir)
    if (filesystem.exists(p)) filesystem.delete(p, true)
  }
}
