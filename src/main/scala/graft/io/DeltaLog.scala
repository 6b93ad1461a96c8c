package graft.io

import java.nio.charset.StandardCharsets
import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/**
 * Delta-protocol transaction-log EXPORT of a [[Manifest]] table — the
 * interop layer that makes a graft-committed corpus consumable by any
 * engine that reads Delta Lake (Spark+delta, Trino, DuckDB's delta
 * extension, delta-rs), per the public Delta Transaction Log Protocol
 * (delta-io/delta PROTOCOL.md). BASELINE.json's approach line names
 * "Parquet/Delta I/O"; [[Manifest.exportSymlinkManifest]] covers the
 * file-list consumers, this covers the table-format consumers.
 *
 * Mapping is 1:1 and derived — the Manifest stays the source of truth:
 *
 *  - Delta version  = `commit_seq` (already contiguous from 0).
 *  - `<v padded to 20>.json` per retained manifest, one action per line
 *    (the protocol's line-delimited JSON framing): the oldest exported
 *    version carries `protocol` (minReaderVersion 1 — nothing the
 *    export writes needs reader features beyond the base protocol),
 *    `metaData` (stable table id, `schemaString` = the parquet
 *    schema's StructType JSON — the serialization format Delta itself
 *    uses) and the full `add` set; every later version carries the
 *    file DIFF vs its predecessor (`remove` + `add`), which is exactly
 *    an overwrite/append commit's shape.
 *  - After [[Manifest.vacuum]] the oldest retained seq is > 0, so a
 *    reader can no longer fold from version 0: the export then writes a
 *    CHECKPOINT parquet (full protocol/metaData/add state, the
 *    protocol's checkpoint schema) at the oldest retained version plus
 *    the `_last_checkpoint` pointer, and drops the now-covered older
 *    commit JSONs — the protocol's own log-retention move.
 *
 * Commit JSONs are immutable once written (re-export only emits
 *    versions missing from the log — incremental, cost ∝ new commits,
 *    which is what keeps the export viable at a 100 TB table's commit
 *    cadence) and land via temp + fresh-key rename, so a concurrent
 *    reader never sees a torn action file. `_last_checkpoint` is a
 *    derived pointer (same overwrite discipline as the symlink export:
 *    worst case a reader sees the previous complete pointer).
 *
 * [[activeFiles]]/[[read]]/[[readVersion]] implement the reader side of
 * the same protocol slice (checkpoint + forward fold), used by specs to
 * prove reconstruction equals the Manifest's own view — and standing in
 * for the external engines this container can't install (no egress; the
 * sandbox DuckDB has no delta extension — documented, not hidden).
 */
object DeltaLog {

  private def fs(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def logDir(base: Path) = new Path(base, "_delta_log")
  private def commitPath(ld: Path, v: Long) = new Path(ld, f"$v%020d.json")
  private def checkpointPath(ld: Path, v: Long) =
    new Path(ld, f"$v%020d.checkpoint.parquet")

  /** Stable per-table id: derived from the table's qualified root so
    * every export of the same table agrees (the protocol wants the id
    * constant across commits; a byte-copied clone is a new table). */
  private def tableId(fsys: FileSystem, base: Path): String =
    UUID.nameUUIDFromBytes(
      ("graft-delta:" + fsys.makeQualified(base).toString)
        .getBytes(StandardCharsets.UTF_8)).toString

  private def jstr(s: String): String =
    JsonMethods.compact(JsonMethods.render(JString(s)))

  private def protocolLine: String =
    """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""

  private def metaDataLine(id: String, schemaJson: String, createdAt: Long,
      partitionCols: Seq[String]): String = {
    val pc = partitionCols.map(jstr).mkString("[", ",", "]")
    s"""{"metaData":{"id":"$id","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":${jstr(schemaJson)},"partitionColumns":$pc,""" +
      s""""configuration":{},"createdTime":$createdAt}}"""
  }

  /** `add.partitionValues` from the file's own hive path segments — a
    * partitioned Manifest snapshot's layout IS the value source. */
  private def partitionValuesJson(path: String): String =
    Manifest.partitionValuesOf(path)
      .map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
      .mkString("{", ",", "}")

  private def addLine(path: String, size: Long, modTime: Long,
      stats: String): String =
    s"""{"add":{"path":${jstr(path)},""" +
      s""""partitionValues":${partitionValuesJson(path)},"size":$size,""" +
      s""""modificationTime":$modTime,"dataChange":true,"stats":${jstr(stats)}}}"""

  private def removeLine(path: String, ts: Long): String =
    s"""{"remove":{"path":${jstr(path)},"deletionTimestamp":$ts,"dataChange":true}}"""

  private def commitInfoLine(ts: Long, operation: String): String =
    s"""{"commitInfo":{"timestamp":$ts,"operation":"$operation","operationParameters":{}}}"""

  private def writeLines(fsys: FileSystem, dest: Path, lines: Seq[String]): Unit = {
    val tmp = new Path(dest.getParent, "." + dest.getName + ".tmp")
    val out = fsys.create(tmp, true)
    try out.write((lines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (!fsys.rename(tmp, dest)) {
      fsys.delete(tmp, false)
      // fresh-key rename refused ⇒ a concurrent exporter already wrote
      // this version. Commits are deterministic functions of the
      // manifest history, so the existing file is the same content —
      // losing this race is success, but verify the winner exists.
      if (!fsys.exists(dest))
        throw new RuntimeException(s"delta log write failed for $dest")
    }
  }

  /** Regenerate `_delta_log` from the retained [[Manifest]] history.
    * Incremental: versions already exported are left untouched; returns
    * the versions written by THIS call (commit versions, then the
    * checkpoint version again if one was (re)written). */
  def exportLog(spark: SparkSession, dir: String): Seq[Long] = {
    val (fsys, base) = fs(spark, dir)
    val ms = Manifest.history(spark, dir)
    require(ms.nonEmpty, s"no committed snapshot under $dir")
    // the Delta protocol's merge-on-read encoding is deletion VECTORS
    // (RoaringBitmap), which this export does not emit — a log whose
    // current version lists a MOR snapshot's full data files would
    // serve DELETED rows to every Delta consumer. Refuse loudly;
    // compaction purges the delete state and re-enables the export.
    // (Older RETAINED MOR snapshots are tolerated: current-state reads
    // are correct, and time travel through the Delta log to those
    // versions is documented as ignoring position deletes.)
    require(ms.last.deleteFiles.isEmpty,
      s"current snapshot '${ms.last.snapshot}' carries merge-on-read " +
        "position deletes, which the Delta protocol encodes as deletion " +
        "vectors this export does not emit - run Manifest.compact (purges " +
        "deletes) before exporting the Delta log")
    val ld = logDir(base)
    fsys.mkdirs(ld)
    val now = System.currentTimeMillis()
    val id = tableId(fsys, base)
    // per-SNAPSHOT schema from the parquet footers (basePath read so
    // hive partition columns join the schema, as Delta requires);
    // Delta's schemaString format IS Spark's StructType JSON. Schemas
    // are resolved per version because the protocol models SCHEMA
    // EVOLUTION as a fresh metaData action in the commit that changed
    // it — an overwrite with new columns exports exactly that way.
    val schemaCache = scala.collection.mutable.Map[Long, String]()
    def schemaOf(m: Manifest.ManifestData): String =
      schemaCache.getOrElseUpdate(m.seq,
        Manifest.readFiles(spark, dir, m.files).schema.json)
    def partColsOf(m: Manifest.ManifestData): Seq[String] =
      m.files.headOption
        .map(Manifest.partitionValuesOf(_).map(_._1)).getOrElse(Nil)
    // commitInfo carries the MANIFEST's commit instant, not the export
    // instant — that is what timestamp time travel resolves on
    def tsOf(m: Manifest.ManifestData): Long =
      if (m.committedAt > 0) m.committedAt else now

    // ONE distributed footer pass over the union of every retained
    // snapshot's files: size/modTime AND per-column min/max/nullCount
    // come back together (the protocol's `add.stats` data-skipping
    // metadata), so the export never loops driver-side over file RPCs —
    // at a 100 TB table's file count that loop is the export's only
    // possible bottleneck and it is now files→executors wide
    val stats = FileStats.collect(spark, base,
      ms.flatMap(_.files).distinct)

    def addLinesOf(files: Seq[String]): Seq[String] = files.map { f =>
      val fst = stats(f)
      addLine(f, fst.size, fst.modTime, FileStats.deltaStatsJson(fst))
    }

    val written = Seq.newBuilder[Long]
    ms.zipWithIndex.foreach { case (m, i) =>
      val dest = commitPath(ld, m.seq)
      if (!fsys.exists(dest)) {
        val lines =
          if (i == 0)
            // oldest retained version: full state (version 0's shape; a
            // vacuumed-past-0 table additionally gets a checkpoint below)
            Seq(commitInfoLine(tsOf(m), "WRITE"), protocolLine,
              metaDataLine(id, schemaOf(m), now, partColsOf(m))) ++
              addLinesOf(m.files)
          else {
            val prevM = ms(i - 1)
            val prev = prevM.files
            val removed = prev.filterNot(m.files.toSet)
            val added = m.files.filterNot(prev.toSet)
            val op = if (removed.isEmpty) "APPEND" else "WRITE"
            // schema evolution: the commit that changed the snapshot
            // schema carries a fresh metaData action (the protocol's
            // ALTER TABLE shape); unchanged schemas stay silent
            val metaChange =
              if (schemaOf(m) == schemaOf(prevM)) Nil
              else Seq(metaDataLine(id, schemaOf(m), now, partColsOf(m)))
            Seq(commitInfoLine(tsOf(m), op)) ++ metaChange ++
              removed.map(removeLine(_, now)) ++ addLinesOf(added)
          }
        writeLines(fsys, dest, lines)
        written += m.seq
      }
    }

    val oldest = ms.head.seq
    if (oldest > 0 && !fsys.exists(checkpointPath(ld, oldest))) {
      writeCheckpoint(spark, fsys, ld, oldest, id, schemaOf(ms.head),
        partColsOf(ms.head), ms.head.files, stats, base, now)
      // checkpoint covers everything ≤ oldest: drop expired commit JSONs
      fsys.listStatus(ld).toSeq.map(_.getPath)
        .filter { p =>
          val n = p.getName
          n.endsWith(".json") && !n.startsWith("_") &&
            n.stripSuffix(".json").forall(_.isDigit) &&
            n.stripSuffix(".json").toLong < oldest
        }
        .foreach(fsys.delete(_, false))
      written += oldest
    }
    written.result()
  }

  /** The protocol's checkpoint schema: one row per action, struct
    * columns `protocol`/`metaData`/`add` (unused action classes omitted
    * — the schema is allowed to carry only the action types present). */
  private def writeCheckpoint(spark: SparkSession, fsys: FileSystem, ld: Path,
      version: Long, id: String, schemaJson: String,
      partitionCols: Seq[String], files: Seq[String],
      stats: Map[String, FileStats.FileStat], base: Path, now: Long): Unit = {
    val protocolT = StructType(Seq(
      StructField("minReaderVersion", IntegerType),
      StructField("minWriterVersion", IntegerType)))
    val formatT = StructType(Seq(
      StructField("provider", StringType),
      StructField("options", MapType(StringType, StringType))))
    val metaT = StructType(Seq(
      StructField("id", StringType),
      StructField("format", formatT),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType)),
      StructField("configuration", MapType(StringType, StringType)),
      StructField("createdTime", LongType)))
    val addT = StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType),
      StructField("stats", StringType)))
    val ckptT = StructType(Seq(
      StructField("protocol", protocolT),
      StructField("metaData", metaT),
      StructField("add", addT)))
    val emptyM = Map.empty[String, String]
    val rows =
      Row(Row(1, 2), null, null) ::
      Row(null, Row(id, Row("parquet", emptyM), schemaJson,
        partitionCols, emptyM, now), null) ::
      files.toList.map { f =>
        val fst = stats(f)
        Row(null, null, Row(f, Manifest.partitionValuesOf(f).toMap,
          fst.size, fst.modTime, true, FileStats.deltaStatsJson(fst)))
      }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), ckptT)
    // the checkpoint must be ONE parquet file with the exact protocol
    // name: write single-part to a temp dir, then rename the part file
    val tmpDir = new Path(ld, s".ckpt-$version.tmp")
    df.coalesce(1).write.mode("overwrite").parquet(tmpDir.toString)
    val part = fsys.listStatus(tmpDir).map(_.getPath)
      .find(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
      .getOrElse(throw new RuntimeException(s"no checkpoint part under $tmpDir"))
    val dest = checkpointPath(ld, version)
    if (!fsys.rename(part, dest) && !fsys.exists(dest))
      throw new RuntimeException(s"checkpoint rename failed for $dest")
    fsys.delete(tmpDir, true)
    // derived pointer — overwrite discipline, same as the symlink export
    val lc = new Path(ld, "_last_checkpoint")
    val tmp = new Path(ld, "._last_checkpoint.tmp")
    val out = fsys.create(tmp, true)
    try out.write(s"""{"version":$version,"size":${rows.size}}"""
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    fsys.delete(lc, false)
    if (!fsys.rename(tmp, lc))
      throw new RuntimeException(s"_last_checkpoint write failed under $ld")
  }

  // ---------------------------------------------------------------------
  // Reader side: checkpoint + forward fold, the protocol's state
  // reconstruction. Proves the export against an independent consumer.
  // ---------------------------------------------------------------------

  private def readText(fsys: FileSystem, p: Path): String = {
    val in = fsys.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  /** Commit versions present in the log, ascending. */
  def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val (fsys, base) = fs(spark, dir)
    val ld = logDir(base)
    if (!fsys.exists(ld)) Nil
    else fsys.listStatus(ld).toSeq.map(_.getPath.getName)
      .filter(n => n.endsWith(".json") && !n.startsWith("_") &&
        n.stripSuffix(".json").forall(_.isDigit))
      .map(_.stripSuffix(".json").toLong).sorted
  }

  private def lastCheckpointVersion(fsys: FileSystem, ld: Path): Option[Long] = {
    val lc = new Path(ld, "_last_checkpoint")
    if (!fsys.exists(lc)) None
    else JsonMethods.parse(readText(fsys, lc)) \ "version" match {
      case JInt(v) => Some(v.toLong)
      case _ => None
    }
  }

  /** Active data-file paths (table-root-relative) at `version`
    * (default: latest), reconstructed per the protocol: start from the
    * newest checkpoint ≤ version if one exists, fold commit JSONs
    * forward applying `add`/`remove`. */
  def activeFiles(spark: SparkSession, dir: String,
      version: Option[Long] = None): Seq[String] =
    activeFileStats(spark, dir, version).map(_._1)

  /** [[activeFiles]] plus each file's `add.stats` JSON (None when the
    * log entry carried none — a reader must treat absence as "cannot
    * prune", never as "no rows"). */
  def activeFileStats(spark: SparkSession, dir: String,
      version: Option[Long] = None): Seq[(String, Option[String])] = {
    val (fsys, base) = fs(spark, dir)
    val ld = logDir(base)
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no _delta_log commits under $dir")
    val target = version.getOrElse(vs.max)
    require(vs.contains(target), s"no delta version $target under $dir")
    val ckpt = lastCheckpointVersion(fsys, ld).filter(_ <= target)
    val active = scala.collection.mutable.LinkedHashMap[String, Option[String]]()
    ckpt match {
      case Some(cv) =>
        val ck = spark.read.parquet(checkpointPath(ld, cv).toString)
        val hasStats = ck.schema("add").dataType
          .asInstanceOf[StructType].fieldNames.contains("stats")
        val picked =
          if (hasStats) ck.selectExpr("add.path", "add.stats")
          else ck.selectExpr("add.path", "CAST(NULL AS STRING)")
        picked.where("add IS NOT NULL").collect()
          .map(r => r.getString(0) -> Option(r.getString(1)))
          .sortBy(_._1).foreach { case (p, s) => active(p) = s }
      case None =>
        require(vs.min == 0 || vs.min <= target,
          s"log under $dir starts at version ${vs.min} with no checkpoint")
    }
    val foldFrom = ckpt.getOrElse(-1L)
    vs.filter(v => v > foldFrom && v <= target).foreach { v =>
      readText(fsys, commitPath(ld, v)).split('\n').filter(_.nonEmpty).foreach { line =>
        val j = JsonMethods.parse(line)
        j \ "add" \ "path" match {
          case JString(p) =>
            active(p) = j \ "add" \ "stats" match {
              case JString(s) => Some(s)
              case _ => None
            }
          case _ =>
        }
        j \ "remove" \ "path" match {
          case JString(p) => active -= p
          case _ =>
        }
      }
    }
    active.toSeq
  }

  /** [[activeFiles]] plus each file's `add.partitionValues` (empty map
    * on an unpartitioned table). */
  def activeFilePartitions(spark: SparkSession, dir: String,
      version: Option[Long] = None): Seq[(String, Map[String, String])] = {
    val (fsys, base) = fs(spark, dir)
    val ld = logDir(base)
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no _delta_log commits under $dir")
    val target = version.getOrElse(vs.max)
    require(vs.contains(target), s"no delta version $target under $dir")
    val ckpt = lastCheckpointVersion(fsys, ld).filter(_ <= target)
    val active = scala.collection.mutable.LinkedHashMap[String, Map[String, String]]()
    ckpt.foreach { cv =>
      spark.read.parquet(checkpointPath(ld, cv).toString)
        .selectExpr("add.path", "add.partitionValues")
        .where("add IS NOT NULL").collect()
        .map(r => r.getString(0) ->
          Option(r.getMap[String, String](1)).map(_.toMap).getOrElse(Map.empty))
        .sortBy(_._1).foreach { case (p, m) => active(p) = m }
    }
    val foldFrom = ckpt.getOrElse(-1L)
    vs.filter(v => v > foldFrom && v <= target).foreach { v =>
      readText(fsys, commitPath(ld, v)).split('\n').filter(_.nonEmpty).foreach { line =>
        val j = JsonMethods.parse(line)
        j \ "add" \ "path" match {
          case JString(p) =>
            active(p) = j \ "add" \ "partitionValues" match {
              case JObject(kvs) => kvs.collect {
                case (k, JString(value)) => k -> value }.toMap
              case _ => Map.empty
            }
          case _ =>
        }
        j \ "remove" \ "path" match {
          case JString(p) => active -= p
          case _ =>
        }
      }
    }
    active.toSeq
  }

  /** Partition prune straight off the log: active files whose
    * `partitionValues` match every `equalTo` entry — EXACT (path-value
    * equality), unlike the bounds reasoning in [[prunedFiles]]. */
  def partitionPrunedFiles(spark: SparkSession, dir: String,
      equalTo: Map[String, String]): Seq[String] =
    activeFilePartitions(spark, dir).collect {
      case (p, pv) if equalTo.forall { case (k, v) => pv.get(k).contains(v) } => p
    }

  /** Read only the partitions [[partitionPrunedFiles]] keeps (basePath
    * read — the hive columns come back as real columns). Zero matching
    * partitions → empty frame with the log's metaData schema. */
  def readPartitionPruned(spark: SparkSession, dir: String,
      equalTo: Map[String, String]): DataFrame = {
    val files = partitionPrunedFiles(spark, dir, equalTo)
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext
        .emptyRDD[Row], tableSchema(spark, dir))
    else Manifest.readFiles(spark, dir, files)
  }

  /** The table schema at `version` (default: latest) per the protocol's
    * state reconstruction: the LAST `metaData` action at or before the
    * version (checkpoint state, then forward fold) — so schema
    * evolution reads back exactly as committed, and a pruned read that
    * skipped EVERY file still answers with the right columns. */
  def tableSchema(spark: SparkSession, dir: String,
      version: Option[Long] = None): StructType = {
    val (fsys, base) = fs(spark, dir)
    val ld = logDir(base)
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no _delta_log commits under $dir")
    val target = version.getOrElse(vs.max)
    val ckpt = lastCheckpointVersion(fsys, ld).filter(_ <= target)
    var schemaStr: Option[String] = ckpt.flatMap { cv =>
      spark.read.parquet(checkpointPath(ld, cv).toString)
        .selectExpr("metaData.schemaString").where("metaData IS NOT NULL")
        .collect().headOption.map(_.getString(0))
    }
    val foldFrom = ckpt.getOrElse(-1L)
    vs.filter(v => v > foldFrom && v <= target).foreach { v =>
      readText(fsys, commitPath(ld, v)).split('\n').filter(_.nonEmpty)
        .foreach(line =>
          JsonMethods.parse(line) \ "metaData" \ "schemaString" match {
            case JString(s) => schemaStr = Some(s) // last metaData wins
            case _ =>
          })
    }
    DataType.fromJson(schemaStr.getOrElse(
      throw new IllegalStateException(s"no metaData action under $dir")))
      .asInstanceOf[StructType]
  }

  // ---------------------------------------------------------------------
  // Data skipping: prune files by add.stats min/max before any scan —
  // the protocol's zone-map move, and the reason the export pays for
  // footer stats at all. At 100 TB with a range-clustered layout this
  // turns a point-in-time range query from "open every file" into
  // "open the handful whose bounds overlap".
  // ---------------------------------------------------------------------

  /** a <=> b in the stats JSON's own value space: JSON numbers compare
    * numerically (BigDecimal — exact for long and double renderings),
    * JSON strings lexicographically (sound for plain text AND for the
    * fixed-width ISO date/timestamp renderings). None = incomparable —
    * callers must not prune on it. */
  private def cmpBound(v: JValue, bound: String): Option[Int] = v match {
    case JInt(n) => scala.util.Try(BigDecimal(bound)).toOption
      .map(b => BigDecimal(n).compare(b))
    case JLong(n) => scala.util.Try(BigDecimal(bound)).toOption
      .map(b => BigDecimal(n).compare(b))
    case JDouble(n) => scala.util.Try(BigDecimal(bound)).toOption
      .map(b => BigDecimal(n).compare(b))
    case JDecimal(n) => scala.util.Try(BigDecimal(bound)).toOption
      .map(b => n.compare(b))
    case JString(s) => Some(s.compareTo(bound))
    case _ => None
  }

  /** Can rows of a file with `stats` fall inside `column` ∈ [lo, hi]?
    * KEEP (true) whenever pruning cannot be PROVEN sound: no stats, no
    * bounds for the column, incomparable bound types. The one
    * bounds-free skip is a provably all-null column (nullCount ==
    * numRecords) — a range predicate never matches NULL. */
  private[graft] def statsMayMatch(stats: String, column: String,
      lo: String, hi: String): Boolean = {
    val j = JsonMethods.parse(stats)
    (j \ "minValues" \ column, j \ "maxValues" \ column) match {
      case (JNothing, _) | (_, JNothing) =>
        (j \ "nullCount" \ column, j \ "numRecords") match {
          case (JInt(nc), JInt(nr)) => !(nr > 0 && nc == nr)
          case _ => true
        }
      case (mn, mx) =>
        val below = cmpBound(mx, lo).exists(_ < 0) // max < lo
        val above = cmpBound(mn, hi).exists(_ > 0) // min > hi
        !(below || above)
    }
  }

  /** Active files that MAY hold rows with `column` ∈ [lo, hi] (stats
    * bounds compared per [[statsMayMatch]]; date/timestamp bounds take
    * their fixed-width ISO rendering, e.g. "1995-03-15" /
    * "1995-03-15T00:00:00.000000Z"). */
  def prunedFiles(spark: SparkSession, dir: String, column: String,
      lo: String, hi: String, version: Option[Long] = None): Seq[String] =
    activeFileStats(spark, dir, version).collect {
      case (p, None) => p
      case (p, Some(st)) if statsMayMatch(st, column, lo, hi) => p
    }

  /** Read only the files [[prunedFiles]] keeps. Row-level filtering is
    * still the CALLER's job — bounds only prove which files cannot
    * match, exactly like any zone-map scan. A fully-pruned read returns
    * an empty frame with the log's metaData schema. */
  def readPruned(spark: SparkSession, dir: String, column: String,
      lo: String, hi: String): DataFrame = {
    val files = prunedFiles(spark, dir, column, lo, hi)
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext
        .emptyRDD[Row], tableSchema(spark, dir))
    else Manifest.readFiles(spark, dir, files)
  }

  /** Read the table THROUGH the exported delta log (latest version). */
  def read(spark: SparkSession, dir: String): DataFrame =
    readVersion(spark, dir, -1L)

  /** commitInfo timestamp per retained commit version, ascending.
    * Versions folded into a checkpoint no longer carry commitInfo —
    * timestamp travel resolves over the retained commit JSONs, exactly
    * the window Delta itself can serve after log cleanup. */
  def versionTimestamps(spark: SparkSession, dir: String): Seq[(Long, Long)] = {
    val (fsys, base) = fs(spark, dir)
    val ld = logDir(base)
    versions(spark, dir).flatMap { v =>
      readText(fsys, commitPath(ld, v)).split('\n').filter(_.nonEmpty)
        .flatMap(line =>
          JsonMethods.parse(line) \ "commitInfo" \ "timestamp" match {
            case JInt(ts) => Some(v -> ts.toLong)
            case _ => None
          }).headOption
    }
  }

  /** `TIMESTAMP AS OF` through the log: the newest version whose commit
    * instant is ≤ `tsMillis` (the manifests' own `committed_at`, which
    * the export stamps into commitInfo). */
  def readVersionAsOf(spark: SparkSession, dir: String,
      tsMillis: Long): DataFrame = {
    val vts = versionTimestamps(spark, dir)
    val v = vts.filter(_._2 <= tsMillis).map(_._1).maxOption.getOrElse(
      throw new IllegalArgumentException(
        s"no delta version committed at or before $tsMillis under $dir " +
          s"(earliest retained: ${vts.headOption.map(_._2)})"))
    readVersion(spark, dir, v)
  }

  /** Time travel through the log; `version < 0` means latest. */
  def readVersion(spark: SparkSession, dir: String, version: Long): DataFrame = {
    val files = activeFiles(spark, dir,
      if (version < 0) None else Some(version))
    require(files.nonEmpty, s"delta version has no data files under $dir")
    Manifest.readFiles(spark, dir, files)
  }
}
