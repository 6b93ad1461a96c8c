package graft.io

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/**
 * Manifest-committed table directory: the minimal snapshot-isolation
 * layer that closes the residual race [[TableIO.compactDir]] documents
 * (its two-rename swap has an instant where a reader sees neither file
 * set — the gap table formats close with a manifest commit; reference
 * README.md:619-637's read-write-overlap rule is the same concern
 * handled by scheduling).
 *
 * Layout: `dir/data-<snapshot>/part-*.parquet` plus one
 * `dir/manifest-<commit_seq>.json` per committed snapshot (the snapshot
 * id lives INSIDE the manifest). The CURRENT snapshot is the retained
 * manifest with the highest `commit_seq` — there is deliberately NO
 * mutable "current pointer" file: the commit point is one rename of a
 * temp file onto the fresh key `manifest-<seq>.json`. A fresh-key
 * rename needs no delete-then-rename dance (which on HDFS/S3A leaves a
 * window with no pointer at all and bricks the table if the writer dies
 * inside it): the new manifest either exists completely or not at all,
 * so readers resolve the previous snapshot or the new one — never a
 * mix, never an absent table. A writer that dies earlier leaves an
 * orphan data dir and an unchanged current snapshot.
 *
 * Reads list only the KB-sized `manifest-*.json` keys — never the data
 * tree: the data file set comes from inside the manifest. At 100 TB on
 * S3 that kills both listing pathologies (no LIST over millions of data
 * keys on reads, no rename-directory commit on writes).
 *
 * Concurrency contract — optimistic, single winner per seq: keying the
 * commit file by `commit_seq` (not by snapshot name) makes the publish
 * rename a compare-and-swap. Two writers that both computed seq = N
 * race onto the SAME key `manifest-<N>.json`; on a filesystem whose
 * rename refuses an existing destination (HDFS; Hadoop's local FS —
 * asserted by ManifestSpec) exactly one rename succeeds and the loser
 * THROWS, leaving only an orphan data dir for [[vacuum]] — it can never
 * silently supersede or interleave with the winner. This is the same
 * protocol shape as Delta's `<version>.json` log commit. On stores
 * without atomic no-overwrite rename (raw S3: rename is a last-writer-
 * wins copy+delete) the CAS moves into a registered
 * [[CommitCoordinator]] — an external putIfAbsent on (dir, seq) with
 * Delta's claim/publish/fix-up LogStore protocol; schemes with no
 * registration keep the rename CAS, which is correct on HDFS/local.
 *
 * Time travel: every snapshot's manifest is retained until [[vacuum]]
 * drops it, so [[readAt]] reproduces any retained snapshot byte-for-byte
 * — for a training corpus that is the provenance primitive ("the model
 * trained on snapshot X" stays answerable after the table moves on).
 * Retention is explicit: `vacuum(keepLast = n)` keeps the n newest
 * manifests and every data dir any of them references; data dirs no
 * retained manifest has EVER referenced (crashed pre-commit writes) are
 * deleted only once older than `orphanGraceMs`, so vacuum cannot shoot
 * down a write that has landed data but not yet committed.
 */
object Manifest {

  /** COLUMN MAPPING (round 12, Delta's name mode): a declared-schema
    * field whose metadata carries `delta.columnMapping.physicalName`
    * stores its parquet column under that PHYSICAL name — the logical
    * name is a pure metadata fact, so `RENAME COLUMN` is a KB sidecar
    * write and `DROP COLUMN` is the field's removal (files keep the
    * bytes; no reader ever asks for them, and a later re-ADD of the
    * same logical name gets a FRESH physical name so dropped values
    * can never resurrect). Every library read path maps physical →
    * logical after the scan; [[writeImpl]] maps logical → physical
    * before landing files, so the parquet layer stays uniformly
    * physical. Partition columns refuse mapping — their names are
    * baked into the hive path layout. */
  private[graft] object ColumnMapping {
    val Key = "delta.columnMapping.physicalName"
    val IdKey = "delta.columnMapping.id"

    def physicalNameOf(f: org.apache.spark.sql.types.StructField): String =
      if (f.metadata.contains(Key)) f.metadata.getString(Key) else f.name

    /** Does any field read/write under a name other than its own? */
    def hasMapping(s: org.apache.spark.sql.types.StructType): Boolean =
      s.fields.exists(f => physicalNameOf(f) != f.name)

    /** The schema the parquet layer sees: fields renamed to physical
      * (metadata kept — stats/export faces key on it). */
    def physicalSchema(s: org.apache.spark.sql.types.StructType)
        : org.apache.spark.sql.types.StructType =
      org.apache.spark.sql.types.StructType(
        s.fields.map(f => f.copy(name = physicalNameOf(f))))

    private def q(n: String): String = "`" + n.replace("`", "``") + "`"

    /** physical → LOGICAL projection of a scan, keeping `extra`
      * passthrough columns (hidden metadata tags) in place. */
    def toLogical(df: DataFrame, s: org.apache.spark.sql.types.StructType,
        extra: Seq[String] = Nil): DataFrame =
      df.select(s.fields.map(f =>
        F.col(q(physicalNameOf(f))).as(f.name, f.metadata)) ++
        extra.map(c => F.col(q(c))): _*)

    /** logical → PHYSICAL rename of an outgoing frame: any df column
      * matching a mapped logical name (case-insensitively, Spark's
      * resolution) lands under its physical name; everything else
      * passes through. */
    def toPhysical(df: DataFrame,
        s: org.apache.spark.sql.types.StructType): DataFrame = {
      val m = s.fields.map(f => f.name.toLowerCase(java.util.Locale.ROOT) ->
        physicalNameOf(f)).toMap
      df.select(df.columns.map(c =>
        F.col(q(c)).as(m.getOrElse(c.toLowerCase(java.util.Locale.ROOT), c)))
        .toSeq: _*)
    }
  }

  private def fs(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def manifestPath(dir: String, seq: Long) =
    new Path(dir, s"manifest-$seq.json")

  private[graft] final case class ManifestData(snapshot: String, seq: Long,
      files: Seq[String], deleteFiles: Seq[String] = Nil,
      committedAt: Long = 0L, rewrite: Boolean = false,
      metaB64: Option[String] = None,
      cdcFiles: Seq[String] = Nil, cdcRecorded: Boolean = false)

  /** One read per manifest: snapshot id, commit_seq, the data file
    * list, and any POSITION-DELETE file list (`deletes-<snap>/…`, the
    * merge-on-read state). The file patterns require the `data-`/
    * `deletes-` dir prefixes, so the quoted `snapshot` field can never
    * parse as a phantom file. */
  private def parse(fsys: FileSystem, mp: Path): Option[ManifestData] = {
    if (!fsys.exists(mp)) return None
    val in = fsys.open(mp)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val snap = "\"snapshot\"\\s*:\\s*\"([^\"]+)\"".r
      .findFirstMatchIn(text).map(_.group(1)).getOrElse(return None)
    val seq = "\"commit_seq\"\\s*:\\s*(\\d+)".r
      .findFirstMatchIn(text).map(_.group(1).toLong).getOrElse(return None)
    // optional hive-style `k=v/` segments between the data dir and the
    // part file — a PARTITIONED snapshot's layout
    val files = "\"(data-[^\"/]+/(?:[^\"/=]+=[^\"/]*/)*part-[^\"/]*\\.parquet)\"".r
      .findAllMatchIn(text).map(_.group(1)).toSeq
    val deletes = "\"(deletes-[^\"/]+/part-[^\"/]*\\.parquet)\"".r
      .findAllMatchIn(text).map(_.group(1)).toSeq
    val at = "\"committed_at\"\\s*:\\s*(\\d+)".r
      .findFirstMatchIn(text).map(_.group(1).toLong).getOrElse(0L)
    val rewrite = "\"rewrite\"\\s*:\\s*true".r.findFirstIn(text).isDefined
    // DDL commits embed the table metadata they declare, base64-coded
    // (alphabet is regex-safe against every other field's pattern)
    val metaB64 = "\"meta_b64\"\\s*:\\s*\"([A-Za-z0-9+/=]+)\"".r
      .findFirstMatchIn(text).map(_.group(1))
    // CHANGE-DATA-FEED state (round 13): `cdc_recorded: true` declares
    // that this commit's LOGICAL row change is fully described by its
    // `cdc-<snap>/` files (possibly zero of them — a compaction changes
    // no rows). Commits without the flag predate CDF recording (or are
    // overwrite-class) — the change-feed reader refuses to span them.
    val cdcFs = "\"(cdc-[^\"/]+/part-[^\"/]*\\.parquet)\"".r
      .findAllMatchIn(text).map(_.group(1)).toSeq
    val cdcRec = "\"cdc_recorded\"\\s*:\\s*true".r.findFirstIn(text).isDefined
    Some(ManifestData(snap, seq, files, deletes, at, rewrite, metaB64,
      cdcFs, cdcRec))
  }

  /** All retained manifests, oldest → newest commit order. */
  private def retained(fsys: FileSystem, base: Path): Seq[ManifestData] =
    if (!fsys.exists(base)) Nil
    else fsys.listStatus(base).toSeq
      .map(_.getPath)
      .filter { p =>
        val n = p.getName
        n.startsWith("manifest-") && n.endsWith(".json")
      }
      .flatMap(parse(fsys, _))
      .sortBy(m => (m.seq, m.snapshot))

  /** Retained commit history, oldest → newest — the [[DeltaLog]]
    * export's input view. */
  private[graft] def history(spark: SparkSession, dir: String): Seq[ManifestData] = {
    val (fsys, base) = fs(spark, dir)
    retained(fsys, base)
  }

  /** Retained snapshot ids, oldest → newest commit order. */
  def snapshots(spark: SparkSession, dir: String): Seq[String] = {
    val (fsys, base) = fs(spark, dir)
    retained(fsys, base).map(_.snapshot)
  }

  /** Files of the CURRENT (newest-commit) snapshot, relative paths;
    * empty if the table has never committed. */
  def currentFiles(spark: SparkSession, dir: String): Seq[String] = {
    val (fsys, base) = fs(spark, dir)
    retained(fsys, base).lastOption.map(_.files).getOrElse(Nil)
  }

  /** Overwrite-commit: land `df` as a fresh snapshot, then publish it
    * with ONE rename onto the fresh seq-keyed manifest — the commit
    * point, and a CAS against concurrent writers (see object doc). Any
    * failure before that rename leaves the current snapshot live; losing
    * the CAS throws, leaving an orphan data dir for [[vacuum]]. */
  def write(df: DataFrame, dir: String, snapshot: String): Unit =
    writeImpl(df, dir, snapshot, () => ())

  /** Overwrite-commit with HIVE-STYLE PARTITIONING: the snapshot's data
    * dir carries `col=value/` subdirectories (`df.write.partitionBy`),
    * the manifest lists the nested part files, and readers recover the
    * partition columns via `basePath`. At 100 TB this is the layout
    * that makes the dominant access pattern (one language, one source,
    * one day) a PATH-EXACT file prune — [[readWherePartitions]] selects
    * by `k=v` string match on the manifest's own file list, touching
    * neither the data tree nor any footer. Same commit/CAS/time-travel
    * contract as [[write]]. */
  def writePartitioned(df: DataFrame, dir: String, snapshot: String,
      partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "writePartitioned needs partition columns")
    writeImpl(df, dir, snapshot, () => (), partitionCols = partitionCols)
  }

  /** APPEND-commit in the hive-partitioned layout — the streaming
    * micro-batch unit for a partitioned table: the new batch lands under
    * its own `data-<snapshot>/col=value/` tree, the current file list is
    * carried forward, and partition-exact reads keep working across the
    * whole history. */
  def appendPartitioned(df: DataFrame, dir: String, snapshot: String,
      partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "appendPartitioned needs partition columns")
    writeImpl(df, dir, snapshot, () => (), carryForward = true,
      partitionCols = partitionCols)
  }

  /** Hive `k=v` pairs on a manifest-relative file path (empty for a
    * flat snapshot's files), hive %XX-unescaped. */
  def partitionValuesOf(relPath: String): Seq[(String, String)] =
    relPath.split('/').toSeq.dropRight(1).drop(1).flatMap { seg =>
      seg.indexOf('=') match {
        case i if i > 0 =>
          Some(unescapePath(seg.substring(0, i)) ->
            unescapePath(seg.substring(i + 1)))
        case _ => None
      }
    }

  /** Recovered Spark type of `column` over the FULL file list —
    * metadata-only (footer schema + partition-value inference across
    * every path, the same inference a whole-table read performs), so
    * path-level pruning and the row-level predicate judge a partition
    * column with the SAME type a reader of the table sees. A subset
    * read must NOT be used for this: partition-type inference over a
    * subset can differ (e.g. {"9"} infers long while the full set
    * {"9","x"} infers string). */
  private def recoveredType(spark: SparkSession, dir: String,
      files: Seq[String], column: String): org.apache.spark.sql.types.DataType =
    readFiles(spark, dir, files, declaredSchema(spark, dir)).schema
      .find(_.name == column)
      .map(_.dataType).getOrElse(throw new IllegalArgumentException(
        s"no column '$column' in the table under $dir"))

  /** Invert hive path escaping (%XX for chars unsafe in dir names —
    * the encoding Spark/Hive writers apply inside `k=v` segments). */
  private def unescapePath(s: String): String = {
    if (!s.contains('%')) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Seqs of retained manifests recovered from the KEY NAMES alone (the
    * commit protocol keys every manifest by its seq) — zero content
    * reads, so resolving "which manifest is current" costs one LIST of
    * KB-sized keys however many files the table has. */
  private def manifestSeqs(fsys: FileSystem, base: Path): Seq[Long] =
    if (!fsys.exists(base)) Nil
    else fsys.listStatus(base).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("manifest-") && n.endsWith(".json"))
      .map(_.stripPrefix("manifest-").stripSuffix(".json"))
      .filter(s => s.nonEmpty && s.forall(_.isDigit)).map(_.toLong).sorted

  /** The current manifest's body as a DataFrame — the DISTRIBUTED face
    * of the state for everything data-proportional: the manifest JSON
    * (∝ active file count) is parsed executor-side (multiLine JSON
    * scan), the manifest to read is chosen from the listing alone
    * ([[manifestSeqs]]), and callers filter BEFORE collecting, so a
    * pruned read's driver state is bounded by its selectivity — never
    * by the table's file count. Columns: `file` (one row per data
    * file) plus the scalar `snapshot`/`commit_seq`. */
  private[graft] def currentFilesDF(spark: SparkSession, dir: String): DataFrame = {
    val (fsys, base) = fs(spark, dir)
    val seqs = manifestSeqs(fsys, base)
    require(seqs.nonEmpty, s"no committed snapshot under $dir")
    spark.read.option("multiLine", "true")
      .json(manifestPath(dir, seqs.max).toString)
      .select(F.col("snapshot"), F.col("commit_seq"),
        F.explode(F.col("files")).as("file"))
  }

  /** The current snapshot restricted to partitions where every
    * `equalTo` entry matches the file's `k=v` path values — an EXACT
    * manifest-level prune (no footer reads, no data-tree listing, no
    * bounds reasoning), evaluated INSIDE [[currentFilesDF]]'s frame so
    * only matching paths are ever collected. Values compare in their
    * hive-ESCAPED path rendering (escaped with the same escaper Spark's
    * partitioned writer used), which sidesteps any unescape ambiguity.
    * Zero matching partitions → empty frame with the table schema. */
  def readWherePartitions(spark: SparkSession, dir: String,
      equalTo: Map[String, String]): DataFrame = {
    val (fsys, base) = fs(spark, dir)
    val seqs = manifestSeqs(fsys, base)
    require(seqs.nonEmpty, s"no committed snapshot under $dir")
    val raw = spark.read.option("multiLine", "true")
      .json(manifestPath(dir, seqs.max).toString)
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName
    val cond = equalTo.foldLeft(F.lit(true)) { case (acc, (k, v)) =>
      // every partition segment sits between '/'s (the data dir leads,
      // the part file trails); '/' inside values is always escaped
      acc && F.col("file").contains(s"/${escapePathName(k)}=${escapePathName(v)}/")
    }
    val kept = raw.select(F.explode(F.col("files")).as("file")).where(cond)
      .orderBy("file").collect().map(_.getString(0)).toSeq
    // the merge-on-read delete list is small by design — collect it whole
    val delFiles =
      if (!raw.columns.contains("delete_files")) Nil
      else raw.select(F.explode(F.col("delete_files")).as("d"))
        .orderBy("d").collect().map(_.getString(0)).toSeq
    val hint = declaredSchema(spark, dir)
    if (kept.nonEmpty) readFilesApplyingDeletes(spark, dir, kept, delFiles, hint)
    else {
      // rare path: zero matches — the full list is needed once, for the
      // table's schema
      val all = raw.select(F.explode(F.col("files")).as("file"))
        .orderBy("file").collect().map(_.getString(0)).toSeq
      require(all.nonEmpty, s"no committed snapshot under $dir")
      readFiles(spark, dir, all, hint).limit(0)
    }
  }

  /** File-list read with partition-column recovery. A flat list stays
    * ONE scan relation; a partitioned list reads per `data-<snapshot>`
    * group with that group's dir as `basePath` (Spark's partition
    * discovery refuses one basePath spanning several data roots) and
    * unions by name — missing partition columns null-fill, so a table
    * whose history mixes flat and partitioned snapshots still reads.
    *
    * `schemaHint` (schema evolution): when the caller knows the
    * table's DECLARED schema, the scan runs with it as the
    * user-specified schema — no footer inference (which would sample
    * ONE file and could miss columns newer files carry), and files
    * predating an ADD COLUMN null-fill per file inside the parquet
    * reader. */
  private[graft] def readFiles(spark: SparkSession, dir: String,
      files: Seq[String],
      schemaHint: Option[org.apache.spark.sql.types.StructType] = None)
      : DataFrame = {
    // a mapped hint scans under PHYSICAL names, then projects back to
    // logical — the parquet layer is uniformly physical by contract
    val mapped = schemaHint.filter(ColumnMapping.hasMapping)
    val scanHint = mapped.map(ColumnMapping.physicalSchema).orElse(schemaHint)
    def reader = {
      val r = spark.read
      scanHint.foreach(r.schema)
      r
    }
    val raw =
      if (files.forall(partitionValuesOf(_).isEmpty))
        reader.parquet(files.map(f => s"$dir/$f"): _*)
      else files.groupBy(_.split('/').head).toSeq.sortBy(_._1)
        .map { case (dataDir, fs) =>
          reader.option("basePath", s"$dir/$dataDir")
            .parquet(fs.map(f => s"$dir/$f"): _*)
        }
        .reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
    mapped.fold(raw)(ColumnMapping.toLogical(raw, _))
  }

  // ---- merge-on-read position deletes -----------------------------------

  /** Manifest-relative path of the file each row came from, extracted
    * from `_metadata.file_path` by anchoring on the `data-…/part-…`
    * tail — robust to however the filesystem renders the URI prefix
    * (which an equality join on absolute paths would NOT be). */
  private def relPathCol = org.apache.spark.sql.functions.regexp_extract(
    org.apache.spark.sql.functions.col("_graft_file"),
    "(data-[^/]+/(?:[^/=]+=[^/]*/)*part-[^/]*\\.parquet)$", 1)

  /** [[readFiles]] plus the two hidden columns a position delete keys
    * on: `_graft_file` (absolute scan path) and `_graft_pos` (the
    * parquet row index — stable physical position within the file). */
  private def readFilesMeta(spark: SparkSession, dir: String,
      files: Seq[String],
      schemaHint: Option[org.apache.spark.sql.types.StructType] = None)
      : DataFrame = {
    import org.apache.spark.sql.functions.col
    val mapped = schemaHint.filter(ColumnMapping.hasMapping)
    val scanHint = mapped.map(ColumnMapping.physicalSchema).orElse(schemaHint)
    def withMeta(df: DataFrame): DataFrame =
      df.select(col("*"),
        col("_metadata.file_path").as("_graft_file"),
        col("_metadata.row_index").as("_graft_pos"))
    def reader = {
      val r = spark.read
      scanHint.foreach(r.schema)
      r
    }
    val raw =
      if (files.forall(partitionValuesOf(_).isEmpty))
        withMeta(reader.parquet(files.map(f => s"$dir/$f"): _*))
      else files.groupBy(_.split('/').head).toSeq.sortBy(_._1)
        .map { case (dataDir, fs) =>
          withMeta(reader.option("basePath", s"$dir/$dataDir")
            .parquet(fs.map(f => s"$dir/$f"): _*))
        }
        .reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
    // logical projection keeps the two hidden position-delete tags
    mapped.fold(raw)(ColumnMapping.toLogical(raw, _,
      extra = Seq("_graft_file", "_graft_pos")))
  }

  /** [[readFilesMeta]] with the snapshot's position deletes applied —
    * the LIVE rows of `files`, still carrying `_graft_file`/`_graft_pos`
    * (what a merge-on-read DML needs: judge the predicate on live rows
    * only, then target the survivors by position). */
  private[graft] def readFilesMetaApplyingDeletes(spark: SparkSession,
      dir: String, files: Seq[String], deleteFiles: Seq[String],
      schemaHint: Option[org.apache.spark.sql.types.StructType] = None)
      : DataFrame = {
    val metaDf = readFilesMeta(spark, dir, files, schemaHint)
    if (deleteFiles.isEmpty) return metaDf
    import org.apache.spark.sql.functions.{broadcast, col}
    val dels = spark.read.parquet(deleteFiles.map(f => s"$dir/$f"): _*)
      .select(col("file_path").as("_graft_del_file"),
        col("pos").as("_graft_del_pos"))
    metaDf.withColumn("_graft_rel", relPathCol)
      .join(broadcast(dels),
        col("_graft_rel") =!= "" &&
          col("_graft_rel") === col("_graft_del_file") &&
          col("_graft_pos") === col("_graft_del_pos"),
        "left_anti")
      .drop("_graft_rel")
  }

  /** Read `files` with the snapshot's position deletes applied: a
    * broadcast anti-join on (relative file path, row index) — the
    * merge-on-read contract, correct as long as delete sets stay small
    * relative to the data (their reason to exist; [[compact]] purges
    * them back to zero). */
  private[graft] def readFilesApplyingDeletes(spark: SparkSession, dir: String,
      files: Seq[String], deleteFiles: Seq[String],
      schemaHint: Option[org.apache.spark.sql.types.StructType] = None)
      : DataFrame = {
    if (deleteFiles.isEmpty) return readFiles(spark, dir, files, schemaHint)
    import org.apache.spark.sql.functions.{broadcast, col}
    val dels = spark.read.parquet(deleteFiles.map(f => s"$dir/$f"): _*)
      .select(col("file_path").as("_graft_del_file"),
        col("pos").as("_graft_del_pos"))
    val dataCols = // pre-meta schema
      readFiles(spark, dir, files, schemaHint).columns
    readFilesMeta(spark, dir, files, schemaHint)
      .withColumn("_graft_rel", relPathCol)
      // the "" guard: an unextractable path must KEEP its rows (fail
      // open), never match an equally-unextractable delete entry —
      // "" == "" once deleted every row of the table in development
      .join(broadcast(dels),
        col("_graft_rel") =!= "" &&
          col("_graft_rel") === col("_graft_del_file") &&
          col("_graft_pos") === col("_graft_del_pos"),
        "left_anti")
      .select(dataCols.map(col): _*)
  }

  /** Result of a [[deleteRangeMOR]] commit: the data files the delete
    * targets (NONE of them rewritten — that is the point), the count of
    * position-delete rows written, and the new snapshot id (None = the
    * prune proved no file could match — no commit). */
  final case class MorDelete(targeted: Seq[String], deletedRows: Long,
      committed: Option[String])

  /** MERGE-ON-READ DELETE of rows with `column` ∈ [lo, hi] — the
    * Iceberg-v2 position-delete shape, for when COPYING is the cost
    * problem: instead of rewriting every overlapping file
    * ([[deleteRange]]), the matching rows' (file, row-index) pairs land
    * as a small `deletes-<snapshot>/` parquet and the commit carries
    * the SAME data files plus the delete list. Readers anti-join the
    * delete set (broadcast — it is small by design); [[compact]] /
    * [[compactClustered]] purge deletes back into a clean snapshot.
    * Deleting a few thousand rows from a 100 TB table writes KILOBYTES,
    * not a rewrite of every touched file. Prune, literal space, and
    * NULL semantics are exactly [[deleteRange]]'s; time travel to the
    * pre-delete snapshot still works. */
  def deleteRangeMOR(spark: SparkSession, dir: String, column: String,
      lo: String, hi: String, snapshot: String,
      beforePublish: () => Unit = () => ()): MorDelete = {
    require(snapshot.matches("[A-Za-z0-9._-]+"), s"unsafe snapshot id: $snapshot")
    val (fsys, base) = fs(spark, dir)
    val priors = retained(fsys, base)
    val cur = priors.lastOption.getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot under $dir"))
    require(priors.forall(_.snapshot != snapshot),
      s"snapshot $snapshot already committed under $dir")
    val delDir = new Path(base, s"deletes-$snapshot")
    require(!fsys.exists(delDir), s"deletes-$snapshot already landed under $dir")
    // same exact-partition-first / footer-bounds-second prune as the COW
    // path; the partition comparison uses the FULL file list's recovered
    // type — the type the row predicate casts to (a touched-subset read
    // can infer a different partition type and disagree)
    val partHasCol =
      cur.files.exists(f => partitionValuesOf(f).exists(_._1 == column))
    val authDt: Option[org.apache.spark.sql.types.DataType] =
      if (partHasCol) Some(recoveredType(spark, dir, cur.files, column))
      else None
    val byPartition = cur.files.map(f => f -> authDt.flatMap(
      partitionMayMatch(f, column, lo, hi, _))).toMap
    val undecided = cur.files.filter(f => byPartition(f).isEmpty)
    val stats = FileStats.collect(spark, base, undecided)
    val touch = cur.files.filter(f => byPartition(f).getOrElse(
      FileStats.mayMatch(stats(f), column, lo, hi)))
    if (touch.isEmpty) return MorDelete(Nil, 0L, None)
    import org.apache.spark.sql.functions.col
    // LIVE rows only: judging the predicate on already-MOR-deleted rows
    // would re-record them as deleted in the change feed (and write
    // duplicate delete positions — harmless for the anti-join, wrong
    // for cdc)
    val metaDf = readFilesMetaApplyingDeletes(spark, dir, touch,
      cur.deleteFiles, declaredSchema(spark, dir))
    val dt = authDt.getOrElse(metaDf.schema(column).dataType)
    val c = col(column).cast(dt)
    val inRange = c >= org.apache.spark.sql.functions.lit(lo).cast(dt) &&
      c <= org.apache.spark.sql.functions.lit(hi).cast(dt)
    // rows TO DELETE: NULL never matches a range predicate, and
    // where(inRange) drops null-valued rows from the delete set — the
    // right way round for a delete
    deleteHitsMOR(spark, dir, snapshot, touch, metaDf.where(inRange),
      beforePublish)
  }

  /** The predicate-general MERGE-ON-READ DELETE core (shared by
    * [[deleteRangeMOR]] and the SQL `DELETE` path under
    * `graft.dml.mode = mor`): `hits` is the LIVE frame of rows to
    * delete — derived from [[readFilesMetaApplyingDeletes]] over
    * `touch`, still carrying `_graft_file`/`_graft_pos` — landed as a
    * `deletes-<snapshot>/` position list plus the change record, then
    * committed with the additive rebase (see the commit-loop note
    * below). Data files never move: deleting a few thousand rows from
    * a 100 TB table writes kilobytes. */
  private[graft] def deleteHitsMOR(spark: SparkSession, dir: String,
      snapshot: String, touch: Seq[String],
      hits: DataFrame, beforePublish: () => Unit = () => ()): MorDelete = {
    require(snapshot.matches("[A-Za-z0-9._-]+"), s"unsafe snapshot id: $snapshot")
    import org.apache.spark.sql.functions.col
    val (fsys, base) = fs(spark, dir)
    val priors = retained(fsys, base)
    require(priors.nonEmpty, s"no committed snapshot under $dir")
    require(priors.forall(_.snapshot != snapshot),
      s"snapshot $snapshot already committed under $dir")
    val delDir = new Path(base, s"deletes-$snapshot")
    require(!fsys.exists(delDir), s"deletes-$snapshot already landed under $dir")
    val dels = hits
      .select(relPathCol.as("file_path"), col("_graft_pos").as("pos"))
      // the spec's required sort order for position deletes; also keeps
      // the tiny file deterministic
      .orderBy("file_path", "pos")
    dels.coalesce(1).write.parquet(delDir.toString)
    val delFiles = fsys.listStatus(delDir).toSeq
      .map(_.getPath.getName)
      .filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
      .sorted.map(n => s"deletes-$snapshot/$n")
    val landed = spark.read.parquet(delFiles.map(f => s"$dir/$f"): _*)
    // fail LOUDLY if any delete row lost its file path — such a row
    // would silently never apply (readers fail open on "")
    require(landed.where("file_path = '' OR file_path IS NULL").count() == 0,
      s"position-delete rows with unextractable file paths under $delDir")
    val n = landed.count()
    // the change record: the deleted rows themselves — the MOR commit
    // adds no data files, so without it the change feed could never
    // represent this deletion (the position list names rows, not values)
    val cdcFs = landCdc(spark, dir, snapshot, hits
      .drop("_graft_file", "_graft_pos")
      .withColumn(CdfTypeCol, org.apache.spark.sql.functions.lit("delete")))
    // MOR-delete commit with REBASE: position deletes are an ADDITIVE
    // set keyed by (file, row-index), so a lost CAS rebases onto the
    // winner's head — carrying the winner's files AND delete state,
    // appending this commit's delete files — as long as every data file
    // of the BASE snapshot is still present (this commit's delete rows
    // target base files by position; a winner that rewrote or removed
    // one invalidates those positions — a TRUE conflict, thrown). A
    // concurrent append's new rows are not re-judged by the predicate
    // (WriteSerializable, Delta's default).
    var tries = 0
    var committed = false
    while (!committed) {
      val priors2 = if (tries == 0) priors else retained(fsys, base)
      val head = priors2.last
      if (tries > 0) {
        // the delete rows target the TOUCHED files by position — only
        // those must survive the winner; a race against a rewrite of
        // disjoint files (e.g. a COW delete elsewhere) rebases cleanly
        val gone = touch.filterNot(head.files.toSet)
        if (gone.nonEmpty)
          throw new java.util.ConcurrentModificationException(
            s"MOR delete '$snapshot' for $dir lost its race to a commit " +
              s"that rewrote or removed targeted base file(s) " +
              s"(${gone.take(3).mkString(", ")}) - re-run the delete")
      }
      try {
        publishManifest(fsys, base, dir, snapshot, priors2,
          head.files, head.deleteFiles ++ delFiles, beforePublish,
          cdcFiles = cdcFs, cdcRecorded = true)
        committed = true
      } catch {
        case _: java.util.ConcurrentModificationException
            if tries < MaxAppendCommitRetries => tries += 1
      }
    }
    MorDelete(touch, n, Some(snapshot))
  }

  /** MERGE-ON-READ UPDATE commit (the SQL `UPDATE` path under
    * `graft.dml.mode = mor` — Delta's deletion-vector UPDATE shape):
    * land the UPDATED COPIES of the hit rows as a fresh data dir AND
    * position-delete their originals, in ONE commit. Every head data
    * file carries by reference — cost ∝ updated rows, untouched bytes
    * never move (a thousand-row re-flag on a 100 TB table writes the
    * thousand rows plus a KB position list). The commit both adds
    * files and changes delete state, so append-only incremental
    * readers refuse across it and the change feed serves it via the
    * recorded cdc. ONE publish attempt pinned to the head the
    * positions were computed against (the expectedSeq CAS): any
    * concurrent commit surfaces loudly — re-run the statement.
    *
    * `hits` carries `_graft_file`/`_graft_pos` (LIVE rows matching the
    * predicate — localCheckpoint it so positions, updated copies, and
    * the change record derive from ONE evaluation); `updated` and
    * `cdc` are plain table-column frames. */
  private[graft] def updateHitsMOR(spark: SparkSession, dir: String,
      snapshot: String, hits: DataFrame, updated: DataFrame,
      cdc: DataFrame, partitionCols: Seq[String],
      beforePublish: () => Unit = () => ()): Unit = {
    require(snapshot.matches("[A-Za-z0-9._-]+"), s"unsafe snapshot id: $snapshot")
    import org.apache.spark.sql.functions.col
    val (fsys, base) = fs(spark, dir)
    val priors = retained(fsys, base)
    val cur = priors.lastOption.getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot under $dir"))
    require(priors.forall(_.snapshot != snapshot),
      s"snapshot $snapshot already committed under $dir")
    val delDir = new Path(base, s"deletes-$snapshot")
    val dataDir = new Path(base, s"data-$snapshot")
    require(!fsys.exists(delDir), s"deletes-$snapshot already landed under $dir")
    require(!fsys.exists(dataDir), s"data-$snapshot already landed under $dir")
    hits.select(relPathCol.as("file_path"), col("_graft_pos").as("pos"))
      .orderBy("file_path", "pos")
      .coalesce(1).write.parquet(delDir.toString)
    val delFiles = fsys.listStatus(delDir).toSeq
      .map(_.getPath.getName)
      .filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
      .sorted.map(n => s"deletes-$snapshot/$n")
    val landed = spark.read.parquet(delFiles.map(f => s"$dir/$f"): _*)
    require(landed.where("file_path = '' OR file_path IS NULL").count() == 0,
      s"position-delete rows with unextractable file paths under $delDir")
    // the updated copies land through the same logical→physical choke
    // point as every writer — CHECK constraints included (an UPDATE
    // must not be the door through which a violating value enters)
    val (gatedUpd, verifyConstraints) = constraintGate(spark, dir, updated)
    val toLand = sizeForLanding(declaredSchema(spark, dir)
      .filter(ColumnMapping.hasMapping)
      .fold(gatedUpd)(ColumnMapping.toPhysical(gatedUpd, _)))
    if (partitionCols.isEmpty) toLand.write.parquet(dataDir.toString)
    else toLand.write.partitionBy(partitionCols: _*).parquet(dataDir.toString)
    try verifyConstraints()
    catch { case t: Throwable =>
      fsys.delete(dataDir, true); fsys.delete(delDir, true); throw t
    }
    def walk(p: Path, rel: String): Seq[String] =
      fsys.listStatus(p).toSeq.sortBy(_.getPath.getName).flatMap { st =>
        val nm = st.getPath.getName
        if (st.isDirectory && nm.contains("=")) walk(st.getPath, s"$rel$nm/")
        else if (!st.isDirectory && nm.startsWith("part-") &&
          nm.endsWith(".parquet")) Seq(s"$rel$nm")
        else Nil
      }
    val newFiles = walk(dataDir, "").map(f => s"data-$snapshot/$f")
    val cdcFs = landCdc(spark, dir, snapshot, cdc)
    publishManifest(fsys, base, dir, snapshot, priors,
      cur.files ++ newFiles, cur.deleteFiles ++ delFiles, beforePublish,
      cdcFiles = cdcFs, cdcRecorded = true,
      expectedSeq = Some(cur.seq + 1))
  }

  /** APPEND-commit: land `df` as a fresh data dir and publish a snapshot
    * whose file list CARRIES FORWARD the current snapshot's files plus
    * the new ones — Delta's append-mode commit, and the natural unit for
    * a streaming micro-batch. Same atomicity/CAS story as [[write]];
    * time travel to the pre-append snapshot still works. */
  def append(df: DataFrame, dir: String, snapshot: String): Unit =
    appendImpl(df, dir, snapshot, () => ())

  private[graft] def appendImpl(df: DataFrame, dir: String, snapshot: String,
      beforePublish: () => Unit, partitionCols: Seq[String] = Nil): Unit =
    writeImpl(df, dir, snapshot, beforePublish, carryForward = true,
      partitionCols = partitionCols)

  /** Is `snapshot` a retained, committed snapshot of this table? */
  def isCommitted(spark: SparkSession, dir: String, snapshot: String): Boolean = {
    val (fsys, base) = fs(spark, dir)
    retained(fsys, base).exists(_.snapshot == snapshot)
  }

  /** Delete the landed-but-never-committed `data-<snapshot>` dir of a
    * crashed attempt so the SAME snapshot id can be retried — the replay
    * path of an at-least-once writer (a streaming foreachBatch) that
    * died inside the land→publish window. Refuses to touch a COMMITTED
    * snapshot's data. Returns true iff an orphan was removed. */
  def abandonOrphan(spark: SparkSession, dir: String, snapshot: String): Boolean = {
    val (fsys, base) = fs(spark, dir)
    if (retained(fsys, base).exists(_.snapshot == snapshot)) false
    else {
      val d = new Path(base, s"data-$snapshot")
      val dd = new Path(base, s"deletes-$snapshot")
      val dc = new Path(base, s"cdc-$snapshot")
      val gotData = fsys.exists(d) && fsys.delete(d, true)
      val gotDels = fsys.exists(dd) && fsys.delete(dd, true)
      if (fsys.exists(dc)) fsys.delete(dc, true)
      gotData || gotDels
    }
  }

  /** Test seam: `beforePublish` runs after the manifest temp file is
    * staged, immediately before the commit rename — the window a
    * concurrent writer would race into. */
  /** Land a CHANGE-DATA frame (table columns + `_change_type`) under
    * `cdc-<snapshot>/` — the commit's row-level change record, written
    * BEFORE the manifest publish so a failed commit leaves only a
    * vacuum-able orphan. Lands under PHYSICAL column names on mapped
    * tables (the parquet layer is uniformly physical by contract;
    * `_change_type` has no mapping and passes through). Flat layout:
    * cdc volume ∝ changed rows, so hive-partitioning the change record
    * buys nothing at the scale it exists for. Returns the
    * manifest-relative cdc file paths. */
  private def landCdc(spark: SparkSession, dir: String, snapshot: String,
      cdcDf: DataFrame, landingBytes: Option[Long] = None): Seq[String] = {
    val (fsys, base) = fs(spark, dir)
    val cdcDir = new Path(base, s"cdc-$snapshot")
    require(!fsys.exists(cdcDir), s"cdc-$snapshot already landed under $dir")
    val toLand = sizeForLanding(declaredSchema(spark, dir)
      .filter(ColumnMapping.hasMapping)
      .fold(cdcDf)(ColumnMapping.toPhysical(cdcDf, _)), landingBytes)
    toLand.write.parquet(cdcDir.toString)
    fsys.listStatus(cdcDir).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
      .sorted.map(n => s"cdc-$snapshot/$n")
  }

  /** Default per-file landing target (in OPTIMIZER-ESTIMATED bytes;
    * parquet compression makes the on-disk file a factor smaller).
    * Override with `spark.graft.write.targetFileBytes`. */
  private val DefaultTargetFileBytes = 64L << 20

  /** Output file sizing at the landing choke points: coalesce the
    * outgoing frame so each write task carries roughly
    * `spark.graft.write.targetFileBytes` of estimated data instead of
    * landing one near-empty part file per upstream partition — a small
    * commit lands ONE file, a large commit still lands many. The
    * estimate is the optimizer's `sizeInBytes`, which on join-derived
    * plans OVER-estimates — an over-estimate only keeps more
    * partitions (coalesce never raises the count), so the floor is
    * safe in both directions. Scale-adaptive by construction: the file
    * count derives from data size, not from the session's core count.
    *
    * A caller that EXPLICITLY laid out its frame keeps that layout:
    * compaction's ceil(bytes/target) split, the range-clustered zorder
    * rewrite, and fixtures landing N range-clustered files for
    * data-skipping demonstrations all repartition immediately below
    * the write, so the sizer walks through the order-preserving
    * wrappers this file adds (column-mapping Project, constraint-gate
    * CollectMetrics, within-partition Sort) and backs off when it
    * finds a RepartitionOperation. */
  private def sizeForLanding(df: DataFrame,
      knownDiskBytes: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical._
    @annotation.tailrec
    def explicitLayout(p: LogicalPlan): Boolean = p match {
      case _: RepartitionOperation => true
      case s: Sort if !s.global => explicitLayout(s.child)
      case pr: Project => explicitLayout(pr.child)
      case f: Filter => explicitLayout(f.child)
      case a: SubqueryAlias => explicitLayout(a.child)
      case m: CollectMetrics => explicitLayout(m.child)
      case _ => false
    }
    val analyzed = df.queryExecution.analyzed
    if (explicitLayout(analyzed)) df
    else {
      val target = df.sparkSession.conf
        .getOption("spark.graft.write.targetFileBytes")
        .map(_.toLong).getOrElse(DefaultTargetFileBytes)
      // Preferred estimate: the caller's KNOWN on-disk byte count (a DML
      // rewrite knows exactly which files it re-packs), inflated ×4 for
      // parquet-encoded → in-memory width. Fallback: analyzed-plan
      // stats — the same sizeInBytes the optimizer would see, WITHOUT
      // running a second full optimization pass per commit. Join-derived
      // plans (MERGE) over-estimate wildly there, which is why the
      // explicit path exists; over-estimates only keep more partitions.
      val est: BigInt = knownDiskBytes.map(b => BigInt(b) * 4)
        .getOrElse(analyzed.stats.sizeInBytes)
      val n = ((est + target - 1) / target).min(BigInt(Int.MaxValue)).toInt
      // Floor of 16: a bare coalesce(1) over a scan→write plan would
      // collapse the whole read+rewrite to ONE task (coalesce merges the
      // final stage, it does not insert a shuffle) — keep at least
      // 16-way parallelism and let n take over as soon as the data is
      // big enough to deserve more files. coalesce never RAISES a
      // partition count, so a frame already narrower than the floor
      // (a 2-partition scan, say) lands its natural file count.
      df.coalesce(math.max(16, n))
    }
  }

  /** Total on-disk bytes of manifest-relative `files` under `dir` —
    * the landing-size hint a DML rewrite passes to its commit. */
  def filesBytes(spark: SparkSession, dir: String, files: Seq[String]): Long = {
    val (fsys, base) = fs(spark, dir)
    files.map(f => fsys.getFileStatus(new Path(base, f)).getLen).sum
  }

  /** Declared CHECK constraints of the table dir — (name, predicate
    * SQL) pairs from the metadata sidecar's reserved properties. */
  private[graft] def checkConstraints(spark: SparkSession,
      dir: String): Seq[(String, String)] = {
    val (fsys, base) = fs(spark, dir)
    graft.catalog.GraftTableMeta.read(fsys, base)
      .map(_.properties).getOrElse(Map.empty).toSeq
      .collect { case (k, v) if k.startsWith(
          graft.catalog.GraftTableMeta.ConstraintPropPrefix) =>
        k.stripPrefix(graft.catalog.GraftTableMeta.ConstraintPropPrefix) -> v
      }
      .sortBy(_._1)
  }

  /** CHECK-constraint gate for a write: attach ONE observation to the
    * outgoing frame counting each constraint's violations (SQL
    * semantics — TRUE and UNKNOWN pass, FALSE violates), riding the
    * write job itself: zero extra scans however many constraints.
    * Returns the instrumented frame and a verifier to call AFTER the
    * write action; the verifier throws naming every violated
    * constraint with its count (the caller discards the landed data —
    * the commit never publishes). */
  private def constraintGate(spark: SparkSession, dir: String,
      df: DataFrame): (DataFrame, () => Unit) = {
    val cons = checkConstraints(spark, dir)
    if (cons.isEmpty) return (df, () => ())
    val obs = org.apache.spark.sql.Observation()
    val aggs = cons.map { case (name, sql) =>
      F.sum(F.when(F.expr(s"($sql) IS FALSE"), 1L).otherwise(0L)).as(name)
    }
    val gated = df.observe(obs, aggs.head, aggs.tail: _*)
    (gated, () => {
      val row = obs.get
      val bad = cons.flatMap { case (name, sql) =>
        Option(row.getOrElse(name, null)).collect {
          case n: java.lang.Long if n > 0 => s"'$name' ($sql): $n row(s)"
        }
      }
      if (bad.nonEmpty)
        throw new IllegalStateException(
          s"graft: write into $dir violates CHECK constraint(s) " +
            s"${bad.mkString("; ")} - no data was committed")
    })
  }

  private[graft] def writeImpl(df: DataFrame, dir: String, snapshot: String,
      beforePublish: () => Unit, carryForward: Boolean = false,
      carriedExplicit: Option[Seq[String]] = None,
      partitionCols: Seq[String] = Nil,
      deletesExplicit: Option[Seq[String]] = None,
      rewrite: Boolean = false,
      cowBase: Option[ManifestData] = None,
      cdc: Option[DataFrame] = None,
      cdcNoChange: Boolean = false,
      expectedSeq: Option[Long] = None,
      landingBytes: Option[Long] = None): Unit = {
    // expectedSeq pins single-attempt whole-state commits (compaction,
    // MOR update) to the head their state was computed from — see
    // publishManifest's head-consistency guard. The retrying tiers
    // re-derive state per attempt, so pinning them would just spin.
    require(expectedSeq.isEmpty || (cowBase.isEmpty && !carryForward),
      "expectedSeq is for single-attempt commits only")
    require(snapshot.matches("[A-Za-z0-9._-]+"), s"unsafe snapshot id: $snapshot")
    val spark = df.sparkSession
    val (fsys, base) = fs(spark, dir)
    val dataDir = new Path(base, s"data-$snapshot")
    require(!fsys.exists(dataDir), s"snapshot $snapshot already landed under $dir")
    require(retained(fsys, base).forall(_.snapshot != snapshot),
      s"snapshot $snapshot already committed under $dir")
    // CHECK constraints gate every writer at this choke point, on the
    // LOGICAL frame (predicates name logical columns), riding the
    // write job's own pass — a violating batch lands nothing durable
    // (the data dir is deleted, the manifest never publishes)
    val (gated, verifyConstraints) = constraintGate(spark, dir, df)
    // the ONE choke point every writer funnels through (INSERT, sink,
    // DML rewrites, maintenance): a column-mapped table lands its
    // files under PHYSICAL names, whatever frame the caller built
    val toLand = sizeForLanding(declaredSchema(spark, dir)
      .filter(ColumnMapping.hasMapping)
      .fold(gated)(ColumnMapping.toPhysical(gated, _)), landingBytes)
    if (partitionCols.isEmpty) toLand.write.parquet(dataDir.toString)
    else toLand.write.partitionBy(partitionCols: _*).parquet(dataDir.toString)
    try verifyConstraints()
    catch { case t: Throwable => fsys.delete(dataDir, true); throw t }
    // list the landed part files: flat for an unpartitioned snapshot,
    // descending through `k=v/` dirs for a partitioned one — rel paths
    // keep the partition segments so the manifest IS the partition index
    def walk(p: Path, rel: String): Seq[String] =
      fsys.listStatus(p).toSeq.sortBy(_.getPath.getName).flatMap { st =>
        val n = st.getPath.getName
        if (st.isDirectory && n.contains("=")) walk(st.getPath, s"$rel$n/")
        else if (!st.isDirectory && n.startsWith("part-") &&
          n.endsWith(".parquet")) Seq(s"$rel$n")
        else Nil
      }
    val files = walk(dataDir, "")
    // the commit's row-level change record lands beside the data —
    // published (or orphaned) together with it
    val cdcLanded = cdc.map(landCdc(spark, dir, snapshot, _, landingBytes))
      .getOrElse(Nil)
    val cdcRec = cdc.isDefined || cdcNoChange
    // COMMIT REBASE (Delta's OptimisticTransaction shape), two tiers:
    //
    //  - PLAIN APPENDS: new files live in their own data-<snapshot> dir,
    //    DISJOINT from any concurrent commit by construction, so a lost
    //    CAS is never a conflict — re-read the head, recompute the
    //    carry-forward (the winner's files AND delete state), retry.
    //  - COW REWRITES with a declared base (`cowBase`: predicate-scoped
    //    DELETE/UPDATE/MERGE): a lost CAS triggers Delta's FILE-LEVEL
    //    conflict check against the new head. The commit rebases iff
    //    the winner left every file this rewrite TOUCHED in place and
    //    did not change merge-on-read delete state — then the rebased
    //    carry is simply "the winner's head minus the touched files",
    //    which keeps the winner's appends and the winner's own rewrites
    //    of files this commit never read. A winner that rewrote or
    //    removed a touched file, or changed delete state, is a TRUE
    //    conflict: throw loudly. (WriteSerializable semantics, as Delta
    //    defaults: a concurrent append's rows are not re-judged by this
    //    commit's predicate.)
    //
    // Whole-table rebases (overwrite, compaction) declare no cowBase
    // and still throw on any lost race: they READ the entire table, so
    // every concurrent commit is a conflict.
    //
    // EVERYTHING the commit derives — seq, conflict check, rebased
    // carry, delete state — comes from the ONE `retained()` read inside
    // attempt(). Splitting them (rebase in the retry handler, seq in
    // the next attempt) is a TOCTOU: a commit landing between the two
    // reads would be counted in the seq (rename succeeds) while its
    // files are missing from the stale carry — its rows silently
    // vanish from the new head.
    val plainAppend = carryForward && carriedExplicit.isEmpty &&
      deletesExplicit.isEmpty && !rewrite
    // the rebase tier is keyed by the DECLARED base, not the rewrite
    // flag: a zero-touch MERGE (inserts only, rewrite=false) rebases
    // like an append — its touched set is empty, so the conflict check
    // passes trivially and the carry re-derives from the new head
    val cowRebase = cowBase.isDefined && carriedExplicit.isDefined
    def attempt(): Unit = {
      val priors = retained(fsys, base)
      require(priors.forall(_.snapshot != snapshot),
        s"snapshot $snapshot already committed under $dir")
      val carried: Seq[String] =
        if (cowRebase) {
          val bse = cowBase.get
          val keep = carriedExplicit.get
          val head = priors.lastOption.getOrElse(bse)
          if (head.seq == bse.seq && head.snapshot == bse.snapshot) keep
          else {
            // head moved since the rewrite was computed: file-level
            // conflict check + rebase against THIS priors snapshot —
            // the same one the seq derives from, so any later commit
            // still collides on the seq CAS and re-enters here
            val touched = bse.files.toSet -- keep
            if (head.deleteFiles.sorted != bse.deleteFiles.sorted)
              throw new TrueConflictException(
                s"commit '$snapshot' for $dir lost its race to a commit " +
                  "that changed merge-on-read delete state; the rewrite " +
                  "was computed without it - re-run the operation")
            val gone = touched.filterNot(head.files.toSet)
            if (gone.nonEmpty)
              throw new TrueConflictException(
                s"commit '$snapshot' for $dir lost its race to a commit " +
                  s"that rewrote or removed file(s) this rewrite also " +
                  s"touched (${gone.take(3).mkString(", ")}) - re-run " +
                  "the operation")
            head.files.filterNot(touched)
          }
        } else carriedExplicit.getOrElse(
          if (carryForward) priors.lastOption.map(_.files).getOrElse(Nil)
          else Nil)
      // delete files: a rewrite (COW DML, compact, overwrite) resets MOR
      // state for the files it replaces; append carries it forward —
      // appended files can't be targeted by pre-existing deletes and the
      // carried data files keep theirs
      val deletes = deletesExplicit.getOrElse(
        if (carryForward) priors.lastOption.map(_.deleteFiles).getOrElse(Nil)
        else Nil)
      publishManifest(fsys, base, dir, snapshot, priors,
        carried ++ files.map(f => s"data-$snapshot/$f"), deletes, beforePublish,
        rewrite, cdcFiles = cdcLanded, cdcRecorded = cdcRec,
        expectedSeq = expectedSeq)
    }
    if (!plainAppend && !cowRebase) attempt()
    else {
      var tries = 0
      var committed = false
      while (!committed) {
        try { attempt(); committed = true }
        catch {
          // retry only the CAS loss; a TrueConflictException is final
          case cme: java.util.ConcurrentModificationException
              if !cme.isInstanceOf[TrueConflictException] &&
                tries < MaxAppendCommitRetries =>
            tries += 1 // head moved: the next attempt re-reads and rebases
        }
      }
    }
  }

  /** Publish a snapshot whose NEW files were ALREADY LANDED by
    * executors under `data-<snapshot>/` — the DSv2 streaming write's
    * commit half (the epoch's DataWriters wrote the parquet; the
    * driver publishes). Append mode carries the head forward and
    * REBASES on a lost CAS exactly like [[append]] (new files live in
    * their own dir, disjoint from any concurrent commit by
    * construction); overwrite mode (streaming Complete) replaces the
    * file list and treats any lost race as a true conflict (it
    * logically read the whole table). */
  private[graft] def commitLandedAppend(spark: SparkSession, dir: String,
      snapshot: String, newFiles: Seq[String],
      overwrite: Boolean = false): Unit = {
    require(snapshot.matches("[A-Za-z0-9._-]+"), s"unsafe snapshot id: $snapshot")
    require(newFiles.nonEmpty, s"nothing landed for snapshot $snapshot")
    require(newFiles.forall(_.startsWith(s"data-$snapshot/")),
      s"landed files must live under data-$snapshot/")
    val (fsys, base) = fs(spark, dir)
    // CHECK constraints: the epoch's files were landed executor-side,
    // so the gate is one scan of the NEW bytes (logical view) before
    // the publish — a violating epoch aborts the query with the
    // constraint named, and its replay hits the same wall (a poison
    // batch surfaces; it can never half-enter the table)
    val cons = checkConstraints(spark, dir)
    if (cons.nonEmpty) {
      val frame = readFiles(spark, dir, newFiles, declaredSchema(spark, dir))
      val aggs = cons.map { case (name, sql) =>
        F.sum(F.when(F.expr(s"($sql) IS FALSE"), 1L).otherwise(0L)).as(name)
      }
      val row = frame.agg(aggs.head, aggs.tail: _*).collect().head
      val bad = cons.zipWithIndex.collect {
        case ((name, sql), i) if !row.isNullAt(i) && row.getLong(i) > 0 =>
          s"'$name' ($sql): ${row.getLong(i)} row(s)"
      }
      if (bad.nonEmpty) {
        fsys.delete(new Path(base, s"data-$snapshot"), true)
        throw new IllegalStateException(
          s"graft: streaming epoch into $dir violates CHECK " +
            s"constraint(s) ${bad.mkString("; ")} - the epoch was not " +
            "committed")
      }
    }
    if (overwrite) {
      val priors = retained(fsys, base)
      require(priors.forall(_.snapshot != snapshot),
        s"snapshot $snapshot already committed under $dir")
      // re-packs previously-served rows ⇒ rewrite-flagged (non-initial)
      publishManifest(fsys, base, dir, snapshot, priors, newFiles, Nil,
        rewrite = priors.nonEmpty)
    } else {
      var tries = 0
      var done = false
      while (!done) {
        val priors = retained(fsys, base)
        require(priors.forall(_.snapshot != snapshot),
          s"snapshot $snapshot already committed under $dir")
        val head = priors.lastOption
        try {
          publishManifest(fsys, base, dir, snapshot, priors,
            head.map(_.files).getOrElse(Nil) ++ newFiles,
            head.map(_.deleteFiles).getOrElse(Nil))
          done = true
        } catch {
          case _: java.util.ConcurrentModificationException
              if tries < MaxAppendCommitRetries => tries += 1
        }
      }
    }
  }

  /** A conflict the rebase tiers can PROVE unrecoverable (a concurrent
    * commit rewrote state this commit read) — still a
    * ConcurrentModificationException to callers, but never retried. */
  private final class TrueConflictException(msg: String)
    extends java.util.ConcurrentModificationException(msg)

  /** Bounded retries for the append-commit rebase — a pathological
    * commit storm must eventually surface instead of spinning. */
  private[graft] val MaxAppendCommitRetries = 5

  /** METADATA-ONLY commit: publish a new manifest that lists the head's
    * files and delete state BY REFERENCE — zero data movement, one KB
    * write. This is the ALTER TABLE serialization point: the seq-keyed
    * CAS rename makes concurrent schema changes (or a schema change
    * racing a write) collide loudly instead of silently interleaving,
    * and the returned seq keys the sidecar's schema-history entry (the
    * graft analogue of Delta's metaData action in its own commit). Not
    * flagged `rewrite`: the file set is unchanged, so streams and
    * incremental readers serve an empty delta and keep going. ONE
    * attempt — the caller owns the retry (it must re-derive the change
    * from the new head). */
  private[graft] def commitMetadata(spark: SparkSession, dir: String,
      snapshot: String, metaB64: Option[String] = None,
      expectedSeq: Option[Long] = None): Long = {
    require(snapshot.matches("[A-Za-z0-9._-]+"), s"unsafe snapshot id: $snapshot")
    val (fsys, base) = fs(spark, dir)
    val priors = retained(fsys, base)
    require(priors.nonEmpty, s"no committed snapshot under $dir")
    require(priors.forall(_.snapshot != snapshot),
      s"snapshot $snapshot already committed under $dir")
    val head = priors.last
    // head-consistency vs expectedSeq is enforced inside
    // publishManifest (shared by every expectedSeq caller)
    publishManifest(fsys, base, dir, snapshot, priors, head.files,
      head.deleteFiles, metaB64 = metaB64, expectedSeq = expectedSeq)
  }

  /** The newest DDL commit's embedded metadata payload, scanning
    * manifests newest-first by filename seq and stopping at the first
    * carrier — the authoritative table-meta read
    * ([[graft.catalog.GraftTableMeta.read]] prefers it over the flat
    * sidecar, which racing ALTER losers can overwrite stale). Tables
    * never ALTERed scan their (vacuum-bounded) retained manifests once
    * and return None. */
  // published manifests are IMMUTABLE, so the per-file payload lookup
  // caches on (path, size, modTime) — the newest-first scan below then
  // costs one LIST and zero re-opens on every table the JVM has
  // already resolved (declaredSchema runs per write/read; without the
  // cache a never-ALTERed table re-opens every retained manifest each
  // time). Bounded by a hard clear — entries are ~0.1 KB.
  private val metaB64Cache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[String]]()

  private[graft] def newestEmbeddedMetaB64(fsys: FileSystem,
      base: Path): Option[String] = {
    if (!fsys.exists(base)) return None
    val byNewest = fsys.listStatus(base).toSeq
      .filter { st =>
        val n = st.getPath.getName
        n.startsWith("manifest-") && n.endsWith(".json")
      }
      .flatMap(st => st.getPath.getName.stripPrefix("manifest-")
        .stripSuffix(".json").toLongOption.map(_ -> st))
      .sortBy(-_._1)
    if (metaB64Cache.size > 65536) metaB64Cache.clear()
    byNewest.iterator.flatMap { case (_, st) =>
      val key = s"${st.getPath}#${st.getLen}#${st.getModificationTime}"
      metaB64Cache.computeIfAbsent(key,
        _ => parse(fsys, st.getPath).flatMap(_.metaB64))
    }.nextOption()
  }

  /** The shared commit tail: stage the manifest JSON, run the test
    * seam, publish with the one seq-keyed CAS rename. Returns the
    * committed seq. */
  private def publishManifest(fsys: FileSystem, base: Path, dir: String,
      snapshot: String, priors: Seq[ManifestData], allFiles: Seq[String],
      deleteFiles: Seq[String], beforePublish: () => Unit = () => (),
      rewrite: Boolean = false, metaB64: Option[String] = None,
      expectedSeq: Option[Long] = None,
      cdcFiles: Seq[String] = Nil, cdcRecorded: Boolean = false): Long = {
    // expectedSeq turns the rename into a FULL head CAS: the caller
    // computed its state as of head expectedSeq-1, so ANY intervening
    // commit (data or DDL) makes the target name taken and the rename
    // refuse — the caller must re-read and re-derive. Without it the
    // seq is allocated fresh off the listing (append semantics).
    //
    // HEAD-CONSISTENCY guard (round 13): the published state (file
    // list, delete state, meta) derives from `priors`, but the CAS
    // target comes from the CALLER's earlier read. If the two disagree
    // — a commit landed in between, or a readdir racing a concurrent
    // rename silently skipped an entry — the rename could WIN while
    // the manifest body is stale, dropping the missed commit's files.
    // Refuse with the retryable conflict instead.
    expectedSeq.foreach { e =>
      val h = priors.lastOption.map(_.seq).getOrElse(-1L)
      if (h != e - 1)
        throw new java.util.ConcurrentModificationException(
          s"commit for $dir expected head seq ${e - 1} but listed $h; " +
            "state must be re-derived")
    }
    val seq = expectedSeq.getOrElse((priors.map(_.seq) :+ -1L).max + 1)
    val body = allFiles.map(f => s"""    "$f"""").mkString(",\n")
    val delBlock =
      if (deleteFiles.isEmpty) ""
      else deleteFiles.map(f => s"""    "$f"""")
        .mkString(",\n  \"delete_files\": [\n", ",\n", "\n  ]")
    // `rewrite: true` marks commits whose NEW files re-serve rows older
    // snapshots already contained (compaction, COW DML) — the analogue
    // of Delta's dataChange=false, which [[readChangesSince]] refuses to
    // diff across instead of re-serving old rows as changes
    val rewriteBlock = if (rewrite) ",\n  \"rewrite\": true" else ""
    // the DDL payload rides IN the commit (Delta's metaData action):
    // meta state and its seq publish under ONE atomic rename, so a
    // racing ALTER can never acknowledge a change computed from a
    // state the table had already left
    val metaBlock = metaB64.map(b => s""",\n  "meta_b64": "$b"""").getOrElse("")
    // CDF state: the flag means "this commit's logical change is fully
    // described by the listed cdc files" (Delta's rule that cdc actions
    // supersede add/remove derivation) — an empty recorded list is a
    // real statement ("no row changed": compaction, zorder)
    val cdcBlock =
      if (!cdcRecorded) ""
      else if (cdcFiles.isEmpty) ",\n  \"cdc_recorded\": true"
      else cdcFiles.map(f => s"""    "$f"""")
        .mkString(",\n  \"cdc_recorded\": true,\n  \"cdc_files\": [\n",
          ",\n", "\n  ]")
    val json =
      s"""{
         |  "snapshot": "$snapshot",
         |  "commit_seq": $seq,
         |  "committed_at": ${System.currentTimeMillis()},
         |  "files": [
         |$body
         |  ]$delBlock$rewriteBlock$metaBlock$cdcBlock
         |}
         |""".stripMargin
    val tmp = new Path(base, s".manifest-$snapshot.tmp")
    val out = fsys.create(tmp, true)
    try out.write(json.getBytes(StandardCharsets.UTF_8)) finally out.close()
    beforePublish()
    CommitCoordinator.forScheme(fsys.getUri.getScheme) match {
      case Some(coord) =>
        // RAW-OBJECT-STORE path (no atomic no-overwrite rename): the
        // CAS is the coordinator's putIfAbsent on (dir, seq); see
        // [[CommitCoordinator]] for the claim/publish/fix-up protocol.
        val claim = coord.claim(dir, seq, tmp.toString)
        val dest = manifestPath(dir, seq)
        if (claim.won) {
          // an overwrite here can only re-write identical bytes (a
          // loser's fix-up copy of OUR staged object), so LWW is safe
          if (!fsys.rename(tmp, dest) && !fsys.exists(dest))
            throw new RuntimeException(
              s"manifest commit rename failed for $dir @ $snapshot (seq $seq)")
        } else {
          // fix up a winner that crashed between claim and publish:
          // copy ITS staged object onto the manifest key (idempotent —
          // every copier writes the same bytes)
          if (!fsys.exists(dest)) {
            val staged = new Path(claim.stagedPath)
            val copied = scala.util.Try {
              if (fsys.exists(staged))
                org.apache.hadoop.fs.FileUtil.copy(
                  fsys, staged, fsys, dest, false, fsys.getConf)
            }
            // a copy racing the winner's own late publish can lose the
            // staged key mid-read — fine iff the manifest is there now
            if (copied.isFailure && !fsys.exists(dest)) throw copied.failed.get
          }
          fsys.delete(tmp, false)
          throw new java.util.ConcurrentModificationException(
            s"commit_seq $seq for $dir was claimed by a concurrent " +
              s"writer; snapshot $snapshot NOT committed " +
              s"(data-$snapshot left as orphan)")
        }
      case None =>
        // the commit point AND the concurrency CAS: one rename onto the
        // seq-keyed manifest. A concurrent writer that already published
        // this seq makes the rename refuse (dest exists) — fail LOUDLY;
        // the landed data dir stays behind as a vacuum-able orphan.
        //
        // SAME-JVM serialization (round 13 — closes an observed lost
        // ALTER): local filesystems implement the no-overwrite refuse
        // as CHECK-then-rename (java.io.File.renameTo REPLACES its
        // destination), so two same-JVM committers racing one seq can
        // both pass the check and both "win", the second silently
        // replacing the first's manifest. HDFS-class stores refuse
        // atomically server-side and raw object stores ride the
        // coordinator branch above, so the TOCTOU is confined to
        // local[*] — which is also exactly where every racer shares
        // this JVM: one lock per (fs, table, seq) closes it.
        // Cross-process local racing stays outside the contract (use
        // HDFS or register a CommitCoordinator).
        val dest = manifestPath(dir, seq)
        renameLocks.computeIfAbsent(
          s"${fsys.getUri}#$dest", _ => new Object).synchronized {
          if (fsys.exists(dest) || !fsys.rename(tmp, dest)) {
            val taken = fsys.exists(dest)
            fsys.delete(tmp, false)
            if (taken)
              throw new java.util.ConcurrentModificationException(
                s"commit_seq $seq for $dir was taken by a concurrent writer; " +
                  s"snapshot $snapshot NOT committed (data-$snapshot left as orphan)")
            else
              throw new RuntimeException(
                s"manifest commit rename failed for $dir @ $snapshot (seq $seq)")
          }
        }
    }
    seq
  }

  /** One lock object per manifest commit key — see the local-FS TOCTOU
    * note at the rename above. Entries are a bare Object per (table,
    * seq) ever committed by this JVM; never cleared (collapsing a lock
    * mid-flight would reopen the race it exists to close). */
  private val renameLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** The DDL sidecar's declared schema when the table dir carries one
    * (nullable-widened) — the authoritative read contract for evolved
    * tables. EVERY whole-table read path consults it: a compaction or
    * restore that read a mixed old/new file list through one sampled
    * footer would silently re-land post-evolution rows WITHOUT their
    * evolved column — permanent data loss through a maintenance call.
    * One exists() + KB read per table resolution. */
  private[graft] def declaredSchema(spark: SparkSession,
      dir: String): Option[org.apache.spark.sql.types.StructType] = {
    val (fsys, base) = fs(spark, dir)
    graft.catalog.GraftTableMeta.read(fsys, base).flatMap(_.schema)
      .map(s => org.apache.spark.sql.types.StructType(
        s.map(_.copy(nullable = true))))
  }

  /** The declared schema AS OF manifest commit `seq` — the sidecar's
    * schema-history resolution (see [[graft.catalog.GraftTableMeta]]):
    * time travel below an `ALTER TABLE ADD COLUMN` reads the
    * as-committed schema WITHOUT the later column, exactly as the
    * Delta export face serves each version's own metaData. */
  private[graft] def declaredSchemaAt(spark: SparkSession, dir: String,
      seq: Long): Option[org.apache.spark.sql.types.StructType] = {
    val (fsys, base) = fs(spark, dir)
    graft.catalog.GraftTableMeta.read(fsys, base).flatMap(_.schemaAt(seq))
      .map(s => org.apache.spark.sql.types.StructType(
        s.map(_.copy(nullable = true))))
  }

  /** Read the current snapshot — from the manifest's file list, never
    * from a data-directory listing. A table that never committed reads
    * as absent (error), not as empty. Evolved tables (DDL sidecar with
    * a declared schema) read under that schema — see [[declaredSchema]]. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val (fsys, base) = fs(spark, dir)
    val m = retained(fsys, base).lastOption.getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot under $dir"))
    require(m.files.nonEmpty, s"no committed snapshot under $dir")
    readFilesApplyingDeletes(spark, dir, m.files, m.deleteFiles,
      declaredSchema(spark, dir))
  }

  /** Incremental read: the rows ADDED after retained snapshot `since`,
    * i.e. the data files in the current snapshot that `since`'s manifest
    * does not list — the change feed a downstream incremental job
    * consumes instead of rescanning the table ([[append]]'s carry-forward
    * makes file sets monotone, so file-list difference IS the row delta).
    * With overwrite [[write]] commits in the history the file diff still
    * never re-serves rows `since` already contained, because a file lives
    * in exactly the snapshots that listed it. At 100 TB this is the
    * manifest-diff read pattern (Delta CDF's simple case): cost ∝ new
    * files, zero listing of the data tree. Returns None when `since` IS
    * the current snapshot (no changes).
    *
    * The guarantee holds across write/append commits only: a REWRITE
    * commit (compaction, COW DELETE/UPDATE — flagged `rewrite: true` in
    * its manifest, the analogue of Delta's dataChange=false) re-packs
    * rows the baseline already contained into new files, so a file diff
    * across one would re-serve old rows as changes. Such a span FAILS
    * LOUDLY instead — the consumer must re-baseline on a snapshot at or
    * after the rewrite. */
  def readChangesSince(spark: SparkSession, dir: String,
      since: String): Option[DataFrame] = {
    val (fsys, base) = fs(spark, dir)
    val all = retained(fsys, base)
    val baseline = all.find(_.snapshot == since).getOrElse(
      throw new IllegalArgumentException(
        s"no retained snapshot '$since' under $dir"))
    val current = all.lastOption.get
    refuseNonAppendSpan(all, baseline, since, dir)
    val newFiles = current.files.filterNot(baseline.files.toSet)
    if (newFiles.isEmpty) None
    else Some(readFiles(spark, dir, newFiles, declaredSchema(spark, dir)))
  }

  // ---- change data feed (round 13) --------------------------------------

  /** The CDF metadata column names — Delta's, verbatim, so downstream
    * consumers written against the public convention port unchanged. */
  private[graft] val CdfTypeCol = "_change_type"
  private[graft] val CdfVersionCol = "_commit_version"
  private[graft] val CdfTimestampCol = "_commit_timestamp"

  /** ROW-LEVEL change feed: every change committed AFTER retained
    * snapshot `since` (exclusive; `"start"` = the full retained
    * history) up to `until` (inclusive; default head), typed by
    * `_change_type` ∈ {insert, delete, update_preimage,
    * update_postimage} and stamped with `_commit_version` (the commit
    * seq) and `_commit_timestamp`. This is the face that serves what
    * [[readChangesSince]] refuses: DML commits record their row-level
    * change as `cdc-<snapshot>/` parquet at commit time (COW
    * DELETE/UPDATE/MERGE, MOR deletes — changed rows, never the table),
    * maintenance rewrites record "no logical change", and plain appends
    * derive their inserts from the added files at zero recording cost
    * (Delta CDF's exact read rule: cdc actions supersede add/remove
    * derivation). Cost ∝ changed rows in the span — never table size.
    *
    * Commits that changed rows WITHOUT a recorded change record (an
    * overwrite, a restore, or history predating CDF recording) refuse
    * loudly: deriving their deltas would mean diffing whole snapshots —
    * data-proportional and silently expensive — so the consumer must
    * re-baseline instead. Slices read under the schema declared as of
    * `until` (older files/change records null-fill inside the reader,
    * Delta's serve-under-latest-schema rule). */
  def readChangeFeed(spark: SparkSession, dir: String, since: String,
      until: Option[String] = None): DataFrame = {
    val (fsys, base) = fs(spark, dir)
    val all = retained(fsys, base)
    require(all.nonEmpty, s"no committed snapshot under $dir")
    val baseline: ManifestData =
      if (since == "start") ManifestData("start", all.head.seq - 1, Nil)
      else all.find(_.snapshot == since).getOrElse(
        throw new IllegalArgumentException(
          s"no retained snapshot '$since' under $dir " +
            "(pass \"start\" for the full retained history)"))
    val endM = until.map(u => all.find(_.snapshot == u).getOrElse(
      throw new IllegalArgumentException(
        s"no retained snapshot '$u' under $dir"))).getOrElse(all.last)
    require(endM.seq >= baseline.seq,
      s"change-feed end '${endM.snapshot}' (seq ${endM.seq}) precedes " +
        s"baseline '$since' (seq ${baseline.seq}) under $dir")
    val span = all.filter(m => m.seq > baseline.seq && m.seq <= endM.seq)
    val declared = declaredSchemaAt(spark, dir, endM.seq)
    val schema = declared.getOrElse(
      readFiles(spark, dir, endM.files).schema)
    val ctSchema = org.apache.spark.sql.types.StructType(schema.fields :+
      org.apache.spark.sql.types.StructField(CdfTypeCol,
        org.apache.spark.sql.types.StringType, nullable = true))
    def stamped(df: DataFrame, m: ManifestData): DataFrame =
      df.withColumn(CdfVersionCol, F.lit(m.seq))
        .withColumn(CdfTimestampCol, F.timestamp_millis(F.lit(m.committedAt)))
    val slices = (baseline +: span).sliding(2).toSeq.flatMap {
      case Seq(prev, m) =>
        val removed = !prev.files.forall(m.files.toSet)
        val morChanged = m.deleteFiles.sorted != prev.deleteFiles.sorted
        if (m.cdcRecorded) {
          if (m.cdcFiles.isEmpty) None
          else Some(stamped(
            readFiles(spark, dir, m.cdcFiles, Some(ctSchema)), m))
        } else if (!m.rewrite && !removed && !morChanged) {
          val added = m.files.filterNot(prev.files.toSet)
          if (added.isEmpty) None // metadata-only commit
          else Some(stamped(readFiles(spark, dir, added, Some(schema))
            .withColumn(CdfTypeCol, F.lit("insert")), m))
        } else throw new IllegalStateException(
          s"cannot serve the change feed since '$since' under $dir: " +
            s"commit '${m.snapshot}' (seq ${m.seq}) changed rows without " +
            "a recorded change-data record (an overwrite, a restore, or " +
            "history predating CDF recording) - re-baseline on a " +
            "snapshot at or after it")
      case _ => None // empty span
    }
    val full = org.apache.spark.sql.types.StructType(ctSchema.fields ++ Seq(
      org.apache.spark.sql.types.StructField(CdfVersionCol,
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField(CdfTimestampCol,
        org.apache.spark.sql.types.TimestampType, nullable = true)))
    if (slices.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], full)
    else slices
      // one column order for every slice — union is positional-safe
      .map(df => df.select(full.fieldNames.map(n => F.col(s"`$n`")).toSeq: _*))
      .reduce(_.unionByName(_))
  }

  /** The incremental-read span guard, shared by [[readChangesSince]]
    * and the `.option("changesSince", …)` relation: every commit after
    * the baseline must be a pure APPEND. Two refusal classes — rewrite
    * commits (compaction/COW DML re-pack pre-existing rows as "new"
    * files), and merge-on-read DELETE commits (ADVICE r12: not
    * rewrite-flagged, but they change position-delete state — possibly
    * against files appended INSIDE the span, so the bare file diff
    * would re-serve rows the span itself deleted). Mirrors the stream
    * face's morChanged check (GraftStreaming). */
  private[graft] def refuseNonAppendSpan(all: Seq[ManifestData],
      baseline: ManifestData, since: String, dir: String): Unit = {
    val span = all.filter(_.seq > baseline.seq)
    span.find(_.rewrite).foreach(m =>
      throw new IllegalStateException(
        s"cannot serve changes since '$since' under $dir: commit " +
          s"'${m.snapshot}' (seq ${m.seq}) is a rewrite (compaction/COW " +
          "DML) whose files re-pack pre-existing rows - re-baseline on a " +
          "snapshot at or after it"))
    (baseline +: span).sliding(2).foreach {
      case Seq(prev, m) if m.deleteFiles.sorted != prev.deleteFiles.sorted =>
        throw new IllegalStateException(
          s"cannot serve changes since '$since' under $dir: commit " +
            s"'${m.snapshot}' (seq ${m.seq}) changed merge-on-read delete " +
            "state, so the appended-file diff would serve rows the span " +
            "deleted - compact, then re-baseline on a snapshot at or " +
            "after it")
      case _ => ()
    }
  }

  /** Time travel: read a RETAINED snapshot exactly as committed.
    * `schemaHint` as on [[readFiles]]; absent a hint, evolved tables
    * read under the schema declared AS OF that snapshot's commit
    * ([[declaredSchemaAt]]) — a snapshot below an ALTER reads WITHOUT
    * the later column. */
  def readAt(spark: SparkSession, dir: String, snapshot: String,
      schemaHint: Option[org.apache.spark.sql.types.StructType] = None)
      : DataFrame = {
    val (fsys, base) = fs(spark, dir)
    val m = retained(fsys, base).find(_.snapshot == snapshot).getOrElse(
      throw new IllegalArgumentException(
        s"no retained snapshot '$snapshot' under $dir"))
    require(m.files.nonEmpty, s"no retained snapshot '$snapshot' under $dir")
    readFilesApplyingDeletes(spark, dir, m.files, m.deleteFiles,
      schemaHint.orElse(declaredSchemaAt(spark, dir, m.seq)))
  }

  /** Export the CURRENT snapshot in the SYMLINK-MANIFEST layout external
    * engines consume without any graft code — the interop format Delta
    * generates for Presto/Athena/Trino (`GENERATE symlink_format_manifest`):
    * a plain text file at `<dir>/_symlink_format_manifest/manifest`
    * holding one fully-qualified data-file URI per line, newest snapshot
    * only. Any engine that can read a parquet file list (Spark, Trino,
    * Hive via SymlinkTextInputFormat, DuckDB `read_parquet([list])`)
    * consumes the snapshot directly — closing the "Parquet/Delta I/O"
    * gap without table-format jars. The export is derived state, not a
    * commit: it is REGENERATED after each publish (same cadence Delta
    * requires for its manifests) and written via temp + rename so a
    * concurrent reader sees the old or new list, never a torn file.
    * Returns the exported URIs in manifest order. */
  def exportSymlinkManifest(spark: SparkSession, dir: String): Seq[String] = {
    val (fsys, base) = fs(spark, dir)
    val files = currentFiles(spark, dir)
    require(files.nonEmpty, s"no committed snapshot under $dir")
    val abs = files.map(f => fsys.makeQualified(new Path(base, f)).toString)
    val outDir = new Path(base, "_symlink_format_manifest")
    fsys.mkdirs(outDir)
    val tmp = new Path(outDir, ".manifest.tmp")
    val out = fsys.create(tmp, true)
    try out.write((abs.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val dest = new Path(outDir, "manifest")
    // derived artifact, not the commit point: an overwrite-refusing FS
    // needs the delete first; the worst a racing reader sees is the
    // previous complete export (rename is still atomic per-file)
    fsys.delete(dest, false)
    if (!fsys.rename(tmp, dest))
      throw new RuntimeException(s"symlink manifest export failed for $dir")
    abs
  }

  /** Result of a copy-on-write [[deleteRange]]/[[updateRange]] commit:
    * which files were rewritten vs carried untouched, and the new
    * snapshot's id (None = the prune proved NO file could match — the
    * table is untouched, no commit). */
  final case class CowRewrite(rewritten: Seq[String], carried: Seq[String],
      committed: Option[String])

  /** The shared copy-on-write core: one distributed footer pass
    * partitions the current snapshot into files whose [min,max] bounds
    * MAY overlap `column` ∈ [lo, hi] and files that provably cannot;
    * only the former are scanned and fed through `rewrite` (with the
    * derived in-range predicate), the latter ride into the new snapshot
    * by file-list reference — never opened, never copied. */
  /** Does a file's PARTITION VALUE for `column` fall inside [lo, hi]?
    * None = the path carries no value for the column (unpartitioned, or
    * partitioned by something else) — the caller falls back to footer
    * bounds. The comparison is derived from the column's RECOVERED
    * Spark type (`dt`, from [[recoveredType]] over the full file list)
    * — the SAME type the row-level predicate casts to — never from an
    * independent parse heuristic: a string-typed partition column
    * holding mixed values ('9' with lo='10') must prune
    * LEXICOGRAPHICALLY, exactly as the row predicate matches, or the
    * prune silently carries files whose rows the predicate selects.
    * Fail-open (keep) whenever the comparison cannot be proven. */
  private def partitionMayMatch(relPath: String, column: String,
      lo: String, hi: String,
      dt: org.apache.spark.sql.types.DataType): Option[Boolean] = {
    import org.apache.spark.sql.types._
    partitionValuesOf(relPath).toMap.get(column).map { v =>
      dt match {
        case _: NumericType =>
          (scala.util.Try(BigDecimal(v)).toOption,
            scala.util.Try(BigDecimal(lo)).toOption,
            scala.util.Try(BigDecimal(hi)).toOption) match {
            case (Some(n), Some(l), Some(h)) => n >= l && n <= h
            case _ => true // unprovable — keep
          }
        // ISO date paths render "2021-01-02": lexicographic ==
        // chronological; strings compare as the row predicate does.
        // Timestamp paths render with ' ' where literals use 'T' —
        // no sound lexicographic compare, so fail open.
        case StringType | DateType => v >= lo && v <= hi
        case _ => true // keep: no sound path-level comparison
      }
    }
  }

  private def cowRewrite(spark: SparkSession, dir: String, column: String,
      lo: String, hi: String, snapshot: String,
      rewrite: (DataFrame, org.apache.spark.sql.Column) => DataFrame,
      beforePublish: () => Unit = () => (),
      cdcOf: (DataFrame, org.apache.spark.sql.Column) => Option[DataFrame] =
        (_, _) => None): CowRewrite = {
    val (fsys, base) = fs(spark, dir)
    val cur = retained(fsys, base).lastOption.getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot under $dir"))
    val files = cur.files
    require(files.nonEmpty, s"no committed snapshot under $dir")
    // partition values prune EXACTLY and for free (path strings); only
    // files without a path-level verdict pay for the footer pass. The
    // comparison type comes from the FULL file list (see
    // [[recoveredType]]) so prune and row predicate cannot disagree.
    val partHasCol =
      files.exists(f => partitionValuesOf(f).exists(_._1 == column))
    val authDt: Option[org.apache.spark.sql.types.DataType] =
      if (partHasCol) Some(recoveredType(spark, dir, files, column))
      else None
    val byPartition = files.map(f => f -> authDt.flatMap(
      partitionMayMatch(f, column, lo, hi, _))).toMap
    val undecided = files.filter(f => byPartition(f).isEmpty)
    val stats = FileStats.collect(spark, base, undecided)
    val (touch, keep) = files.partition(f => byPartition(f).getOrElse(
      FileStats.mayMatch(stats(f), column, lo, hi)))
    if (touch.isEmpty) return CowRewrite(Nil, keep, None)
    // basePath read: a partitioned file's hive columns come back as real
    // columns, and partitionBy on the rewrite puts them back into paths
    // — the snapshot's layout survives the DML. Existing POSITION
    // DELETES are applied to the touched files here (a plain rewrite
    // would resurrect MOR-deleted rows) and the delete list rides into
    // the new snapshot for the carried files (entries that referenced a
    // rewritten file match nothing — harmless).
    val partCols = partitionValuesOf(touch.head).map(_._1)
    val df = readFilesApplyingDeletes(spark, dir, touch, cur.deleteFiles,
      declaredSchema(spark, dir))
    val dt = authDt.getOrElse(df.schema(column).dataType)
    val c = org.apache.spark.sql.functions.col(column).cast(dt)
    val inRange = c >= org.apache.spark.sql.functions.lit(lo).cast(dt) &&
      c <= org.apache.spark.sql.functions.lit(hi).cast(dt)
    writeImpl(rewrite(df, inRange), dir, snapshot, beforePublish,
      carriedExplicit = Some(keep), partitionCols = partCols,
      deletesExplicit = Some(cur.deleteFiles), rewrite = true,
      cowBase = Some(cur), cdc = cdcOf(df, inRange))
    CowRewrite(touch, keep, Some(snapshot))
  }

  /** Copy-on-write DELETE of rows with `column` ∈ [lo, hi] — the
    * lakehouse DELETE path, stats-driven end to end:
    *
    *  1. ONE distributed parquet-footer pass ([[FileStats.collect]])
    *     over the current snapshot's files — metadata-only, no data read.
    *  2. Files whose [min,max] bounds CANNOT overlap the range are
    *     CARRIED FORWARD into the new snapshot by file-list reference —
    *     never opened, never copied. On a range-clustered 100 TB table a
    *     one-year delete rewrites the year, not the table.
    *  3. Only overlapping files are scanned; their surviving rows (NULLs
    *     survive — NULL never matches a range predicate) land as a fresh
    *     data dir, committed atomically with the carried files via the
    *     standard seq-keyed CAS — readers see the pre- or post-delete
    *     snapshot, never a torn mix, and time travel to the pre-delete
    *     snapshot keeps working.
    *
    * `lo`/`hi` are string literals in the column's natural rendering
    * (numerics, ISO date "2021-01-02", ISO timestamp
    * "2021-01-02T03:04:05[.micros]") — the SAME literal space
    * [[DeltaLog.readPruned]] takes; the row-level predicate is derived
    * from them by casting to the column's own Spark type, so prune and
    * predicate can never disagree. */
  def deleteRange(spark: SparkSession, dir: String, column: String,
      lo: String, hi: String, snapshot: String): CowRewrite =
    deleteRangeImpl(spark, dir, column, lo, hi, snapshot, () => ())

  /** Test seam variant of [[deleteRange]] — `beforePublish` opens the
    * commit race window (see [[writeImpl]]'s COW rebase tier). */
  private[graft] def deleteRangeImpl(spark: SparkSession, dir: String,
      column: String, lo: String, hi: String, snapshot: String,
      beforePublish: () => Unit): CowRewrite =
    cowRewrite(spark, dir, column, lo, hi, snapshot, (df, inRange) =>
      // NULLs survive: NOT(null BETWEEN ...) is null, which a bare
      // filter would drop — exactly the wrong way to "delete"
      df.where(org.apache.spark.sql.functions.coalesce(
        org.apache.spark.sql.functions.not(inRange),
        org.apache.spark.sql.functions.lit(true))),
      beforePublish,
      // the change record: exactly the rows the predicate deletes
      // (where(inRange) keeps TRUE rows only — NULLs are not deletes)
      cdcOf = (df, inRange) => Some(df.where(inRange)
        .withColumn(CdfTypeCol, F.lit("delete"))))

  /** Copy-on-write UPDATE of rows with `column` ∈ [lo, hi]: every
    * `set` entry becomes `WHEN in-range THEN expr ELSE old` on the
    * rewritten files only — same stats-confined rewrite, carry, and
    * atomic-commit story as [[deleteRange]] (a one-segment re-flag on a
    * range-clustered 100 TB table rewrites the segment, not the table).
    * Set expressions may reference the row's other columns; update of
    * the prune column itself is refused — rewritten rows could leave
    * their file's clustering range, silently breaking every later
    * prune. */
  def updateRange(spark: SparkSession, dir: String, column: String,
      lo: String, hi: String, snapshot: String,
      set: Map[String, org.apache.spark.sql.Column]): CowRewrite = {
    require(!set.contains(column),
      s"updateRange must not rewrite its own prune column '$column'")
    cowRewrite(spark, dir, column, lo, hi, snapshot, (df, inRange) =>
      set.foldLeft(df) { case (d, (name, expr)) =>
        d.withColumn(name,
          org.apache.spark.sql.functions.when(inRange, expr)
            .otherwise(org.apache.spark.sql.functions.col(name)))
      },
      cdcOf = (df, inRange) => {
        val pre = df.where(inRange)
        val post = set.foldLeft(pre) { case (d, (name, expr)) =>
          d.withColumn(name, expr)
        }
        Some(pre.withColumn(CdfTypeCol, F.lit("update_preimage"))
          .unionByName(post.withColumn(CdfTypeCol,
            F.lit("update_postimage"))))
      })
  }

  /** Compact the current snapshot into ceil(bytes/target) files AS A NEW
    * SNAPSHOT — same bytes, fewer files, and unlike
    * [[TableIO.compactDir]] the swap has no race: readers resolve either
    * manifest, each pointing at a complete file set. */
  def compact(spark: SparkSession, dir: String, snapshot: String,
      targetFileBytes: Long): Long = {
    val (fsys, base) = fs(spark, dir)
    // ONE head read pins everything: the file list the rewrite reads
    // AND the expectedSeq CAS the commit publishes under — a commit
    // landing anywhere in between makes the publish refuse loudly
    // instead of silently dropping the interloper's files
    val cur = retained(fsys, base).lastOption.getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot under $dir"))
    val files = cur.files
    require(files.nonEmpty, s"no committed snapshot under $dir")
    val bytes = files.map(f => fsys.getFileStatus(new Path(base, f)).getLen).sum
    val n = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)
    // position deletes applied, so compaction doubles as the MOR
    // purge: the new snapshot carries zero delete files.
    // cdcNoChange: a compaction re-packs bytes without changing any
    // logical row (pending MOR deletes were already recorded as cdc by
    // the delete commit itself), so the change feed reads it as empty
    val df = readFilesApplyingDeletes(spark, dir, cur.files, cur.deleteFiles,
      declaredSchema(spark, dir)).repartition(n.toInt)
    writeImpl(df, dir, snapshot, () => (), rewrite = true, cdcNoChange = true,
      expectedSeq = Some(cur.seq + 1))
    n
  }

  /** OPTIMIZE with clustering: compact the current snapshot into
    * ceil(bytes/target) files RANGE-CLUSTERED on `clusterCols` — the
    * `OPTIMIZE ... ZORDER BY`-shaped maintenance move. Plain [[compact]]
    * fixes the small-file problem; this one ALSO makes every file's
    * min/max bounds tight on the cluster columns, which is what turns
    * the exports' data-skipping stats ([[DeltaLog.readPruned]],
    * [[IcebergExport.readPruned]], [[deleteRange]]'s prune) from
    * "keeps everything" into "opens the handful of overlapping files".
    * Same new-snapshot/no-reader-race contract as [[compact]]. */
  def compactClustered(spark: SparkSession, dir: String, snapshot: String,
      targetFileBytes: Long, clusterCols: Seq[String]): Long = {
    require(clusterCols.nonEmpty, "compactClustered needs cluster columns")
    val (fsys, base) = fs(spark, dir)
    // one head read pins state + CAS (see compact)
    val cur = retained(fsys, base).lastOption.getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot under $dir"))
    val files = cur.files
    require(files.nonEmpty, s"no committed snapshot under $dir")
    val bytes = files.map(f => fsys.getFileStatus(new Path(base, f)).getLen).sum
    val n = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)
    // position deletes applied - compaction purges MOR state
    val df = readFilesApplyingDeletes(spark, dir, cur.files, cur.deleteFiles,
      declaredSchema(spark, dir)).repartitionByRange(
      n.toInt, clusterCols.map(org.apache.spark.sql.functions.col): _*)
    writeImpl(df, dir, snapshot, () => (), rewrite = true, cdcNoChange = true,
      expectedSeq = Some(cur.seq + 1))
    n
  }

  /** [[compactClustered]] for a HIVE-PARTITIONED table: the rewrite
    * KEEPS the `col=value/` layout AND range-clusters WITHIN it — the
    * range shuffle leads with the partition columns (each hive value
    * stays contiguous across tasks) and continues into the cluster
    * columns, then an intra-task sort tightens every row group, so
    * each written file's min/max bounds are tight on the cluster
    * columns. This is the maintenance move that makes data-skipping
    * effective on a partitioned 100 TB table: partition pruning picks
    * the directory, tight footer bounds then open only the overlapping
    * files inside it. Same new-snapshot / no-reader-race / MOR-purge
    * contract as [[compact]]. */
  def compactClusteredPartitioned(spark: SparkSession, dir: String,
      snapshot: String, targetFileBytes: Long, clusterCols: Seq[String],
      partitionCols: Seq[String]): Long = {
    require(clusterCols.nonEmpty, "compactClusteredPartitioned needs cluster columns")
    require(partitionCols.nonEmpty,
      "compactClusteredPartitioned needs partition columns")
    val (fsys, base) = fs(spark, dir)
    // one head read pins state + CAS (see compact)
    val cur = retained(fsys, base).lastOption.getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot under $dir"))
    val files = cur.files
    require(files.nonEmpty, s"no committed snapshot under $dir")
    val bytes = files.map(f => fsys.getFileStatus(new Path(base, f)).getLen).sum
    val n = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)
    val ordering = (partitionCols ++ clusterCols).map(F.col)
    val df = readFilesApplyingDeletes(spark, dir, cur.files, cur.deleteFiles,
      declaredSchema(spark, dir))
      .repartitionByRange(n.toInt, ordering: _*)
      .sortWithinPartitions(ordering: _*)
    writeImpl(df, dir, snapshot, () => (), partitionCols = partitionCols,
      rewrite = true, cdcNoChange = true, expectedSeq = Some(cur.seq + 1))
    currentFiles(spark, dir).size.toLong
  }

  /** Compaction for a HIVE-PARTITIONED table: same new-snapshot /
    * no-reader-race / MOR-purge contract as [[compact]], but the
    * rewrite KEEPS the `col=value/` layout — a flat compact would
    * silently break every partition-exact read
    * ([[readWherePartitions]]) on the table. The shuffle hashes on the
    * partition columns, so each partition value lands in exactly one
    * task and writes exactly one file per partition tree — the
    * small-file purge for the streaming append cadence. Returns the
    * new snapshot's file count. */
  def compactPartitioned(spark: SparkSession, dir: String, snapshot: String,
      partitionCols: Seq[String]): Long = {
    require(partitionCols.nonEmpty, "compactPartitioned needs partition columns")
    val (fsys, base) = fs(spark, dir)
    // one head read pins state + CAS (see compact)
    val cur = retained(fsys, base).lastOption.getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot under $dir"))
    val df = readFilesApplyingDeletes(spark, dir, cur.files, cur.deleteFiles,
      declaredSchema(spark, dir)).repartition(partitionCols.map(F.col): _*)
    writeImpl(df, dir, snapshot, () => (), partitionCols = partitionCols,
      rewrite = true, cdcNoChange = true, expectedSeq = Some(cur.seq + 1))
    currentFiles(spark, dir).size.toLong
  }

  /** PARTITION-SCOPED compaction (Delta's `OPTIMIZE … WHERE`): rewrite
    * ONLY the files of the hive partitions matching every `equalTo`
    * entry — one file per matched partition value — carrying every
    * other file by reference. This is the daily maintenance move at
    * 100 TB: a date-partitioned table's hot-partition small-file spray
    * compacts for today's bytes, not the table's. The match is the
    * same hive-ESCAPED path comparison [[readWherePartitions]] uses
    * (exact, zero footer reads). MOR deletes targeting the rewritten
    * files are applied during the rewrite (their entries become inert
    * — they reference paths the new snapshot no longer lists); carried
    * files keep their delete state. The commit declares the scoped
    * base, so a racing commit over DISJOINT files rebases instead of
    * failing the maintenance job. Returns the rewritten/carried split
    * (committed = None when nothing matches — no commit). */
  def compactWherePartitions(spark: SparkSession, dir: String,
      snapshot: String, equalTo: Map[String, String]): CowRewrite = {
    require(equalTo.nonEmpty, "compactWherePartitions needs partition values")
    val (fsys, base) = fs(spark, dir)
    val cur = retained(fsys, base).lastOption.getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot under $dir"))
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName
    def matches(f: String): Boolean = equalTo.forall { case (k, v) =>
      f.contains(s"/${escapePathName(k)}=${escapePathName(v)}/")
    }
    val (touch, keep) = cur.files.partition(matches)
    if (touch.isEmpty) return CowRewrite(Nil, keep, None)
    val partCols = partitionValuesOf(touch.head).map(_._1)
    require(partCols.nonEmpty,
      s"compactWherePartitions: matched files under $dir carry no hive layout")
    val df = readFilesApplyingDeletes(spark, dir, touch, cur.deleteFiles,
      declaredSchema(spark, dir))
      .repartition(partCols.map(F.col): _*)
    writeImpl(df, dir, snapshot, () => (), carriedExplicit = Some(keep),
      partitionCols = partCols, deletesExplicit = Some(cur.deleteFiles),
      rewrite = true, cowBase = Some(cur), cdcNoChange = true)
    CowRewrite(touch, keep, Some(snapshot))
  }

  /** PARTITION-SCOPED CLUSTERED compaction (Delta's `OPTIMIZE … WHERE
    * … ZORDER BY`): rewrite ONLY the hive partitions matching every
    * `equalTo` entry, RANGE-CLUSTERED on `clusterCols` within the kept
    * layout, carrying every other file by reference — the nightly
    * hot-partition maintenance move that ALSO makes the partition's
    * footer bounds tight, so selective reads inside it open only the
    * overlapping files. Match, MOR, rebase, and commit semantics are
    * exactly [[compactWherePartitions]]'s; the clustering shuffle is
    * [[compactClusteredPartitioned]]'s, scoped to the matched bytes. */
  def compactClusteredWherePartitions(spark: SparkSession, dir: String,
      snapshot: String, equalTo: Map[String, String],
      targetFileBytes: Long, clusterCols: Seq[String]): CowRewrite = {
    require(equalTo.nonEmpty, "compactClusteredWherePartitions needs partition values")
    require(clusterCols.nonEmpty, "compactClusteredWherePartitions needs cluster columns")
    val (fsys, base) = fs(spark, dir)
    val cur = retained(fsys, base).lastOption.getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot under $dir"))
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName
    def matches(f: String): Boolean = equalTo.forall { case (k, v) =>
      f.contains(s"/${escapePathName(k)}=${escapePathName(v)}/")
    }
    val (touch, keep) = cur.files.partition(matches)
    if (touch.isEmpty) return CowRewrite(Nil, keep, None)
    val partCols = partitionValuesOf(touch.head).map(_._1)
    require(partCols.nonEmpty,
      s"compactClusteredWherePartitions: matched files under $dir carry " +
        "no hive layout")
    require(clusterCols.forall(c => !partCols.contains(c)),
      s"cluster columns ${clusterCols.mkString(", ")} must not include " +
        s"partition columns (${partCols.mkString(", ")})")
    val bytes = touch.map(f => fsys.getFileStatus(new Path(base, f)).getLen).sum
    val n = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)
    val ordering = (partCols ++ clusterCols).map(F.col)
    val df = readFilesApplyingDeletes(spark, dir, touch, cur.deleteFiles,
      declaredSchema(spark, dir))
      .repartitionByRange(n.toInt, ordering: _*)
      .sortWithinPartitions(ordering: _*)
    writeImpl(df, dir, snapshot, () => (), carriedExplicit = Some(keep),
      partitionCols = partCols, deletesExplicit = Some(cur.deleteFiles),
      rewrite = true, cowBase = Some(cur), cdcNoChange = true)
    CowRewrite(touch, keep, Some(snapshot))
  }

  /** RESTORE (Delta's `RESTORE TABLE … TO VERSION AS OF`): make a
    * RETAINED older snapshot the table head again by committing a NEW
    * manifest that lists the target snapshot's files and delete state
    * BY REFERENCE — zero data movement, one KB-sized metadata write,
    * however large the table. History is preserved (the rolled-back
    * snapshots stay retained until [[vacuum]]), so a restore is itself
    * undoable. The commit is flagged `rewrite` — its files re-serve
    * rows older snapshots contained, so incremental readers must
    * re-baseline (correct: a restore rewinds state). A lost commit CAS
    * throws instead of retrying: a concurrent commit changed the very
    * state the operator decided to rewind, so the decision must be
    * re-made against the new head. Restoring the current head is a
    * no-op (returns None). Returns the new snapshot id. */
  def restore(spark: SparkSession, dir: String, snapshot: String,
      metaFor: Long => Option[String] = _ => None): Option[String] = {
    val (fsys, base) = fs(spark, dir)
    val all = retained(fsys, base)
    val target = all.find(_.snapshot == snapshot).getOrElse(
      throw new IllegalArgumentException(
        s"no retained snapshot '$snapshot' under $dir " +
          s"(retained: ${all.map(_.snapshot).mkString(", ")})"))
    if (all.last.snapshot == snapshot) return None
    val newSnap = s"restore-${System.currentTimeMillis()}-" +
      java.util.UUID.randomUUID().toString.take(8)
    // RESTORE rolls METADATA back with the data: the caller's payload
    // (schema history rewound to the target, keyed by THIS commit's
    // seq) rides in the restore commit itself, and expectedSeq pins the
    // head so the rolled-back meta can never publish against a state a
    // concurrent commit has already moved (the documented loud-throw)
    val seq = all.last.seq + 1
    publishManifest(fsys, base, dir, newSnap, all,
      target.files, target.deleteFiles, rewrite = true,
      metaB64 = metaFor(seq), expectedSeq = Some(seq))
    Some(newSnap)
  }

  /** Retention: keep the `keepLast` newest retained manifests (the
    * current snapshot is the newest, so it always survives) plus every
    * data dir any of them references. Data dirs referenced only by
    * DROPPED manifests were committed and superseded — deleted at once.
    * Data dirs NO retained manifest has ever referenced are either
    * crashed pre-commit writes or writes still in flight: deleted only
    * once older than `orphanGraceMs`. Returns the removed entries. */
  def vacuum(spark: SparkSession, dir: String, keepLast: Int = 1,
      orphanGraceMs: Long = 3600000L): Seq[String] = {
    require(keepLast >= 1, "must retain at least the current snapshot")
    val (fsys, base) = fs(spark, dir)
    val all = retained(fsys, base)
    val (dropped, kept) = all.splitAt(math.max(0, all.size - keepLast))
    // position-delete and change-data dirs retire under the same rule
    // as data dirs
    def dirsOf(ms: Seq[ManifestData]) =
      (ms.flatMap(_.files) ++ ms.flatMap(_.deleteFiles) ++
        ms.flatMap(_.cdcFiles)).map(_.split('/').head).toSet
    val live = dirsOf(kept)
    val superseded = dirsOf(dropped) -- live
    val cutoff = System.currentTimeMillis() - orphanGraceMs
    val goneDirs = fsys.listStatus(base).toSeq
      .filter(s => s.isDirectory && (s.getPath.getName.startsWith("data-") ||
        s.getPath.getName.startsWith("deletes-") ||
        s.getPath.getName.startsWith("cdc-")))
      .filterNot(s => live.contains(s.getPath.getName))
      .filter { s =>
        superseded.contains(s.getPath.getName) || s.getModificationTime < cutoff
      }
      .map(_.getPath)
    goneDirs.foreach(p => fsys.delete(p, true))
    // dropping a DDL commit would lose the authoritative embedded
    // metadata — flatten it into the sidecar cache FIRST, so readers
    // that find no embedded carrier fall back to a current flat view
    if (dropped.exists(_.metaB64.isDefined) &&
        !kept.exists(_.metaB64.isDefined))
      graft.catalog.GraftTableMeta.read(fsys, base).foreach { m =>
        graft.catalog.GraftTableMeta.write(fsys, base,
          m.copy(location = None))
      }
    dropped.foreach(m => fsys.delete(manifestPath(dir, m.seq), false))
    goneDirs.map(_.getName) ++ dropped.map(m => s"manifest-${m.snapshot}")
  }
}
