package graft.io

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Manifest-committed table directory: the minimal snapshot-isolation
 * layer that closes the residual race [[TableIO.compactDir]] documents
 * (its two-rename swap has an instant where a reader sees neither file
 * set — the gap table formats close with a manifest commit; reference
 * README.md:619-637's read-write-overlap rule is the same concern
 * handled by scheduling).
 *
 * Layout: `dir/data-<snapshot>/part-*.parquet` + `dir/manifest.json`.
 * Every write lands a FRESH data directory, then publishes it by
 * atomically replacing the one manifest file (write temp + rename — the
 * primitive object stores and HDFS both give for a single key). Readers
 * list nothing: they read the file list FROM the manifest, so they see
 * the previous snapshot or the new one, never a mix, never a partial
 * job — a writer that dies before the rename leaves an orphan data dir
 * and an untouched table. On S3 at 100 TB this also kills the two
 * listing pathologies: no LIST on the read path at all, and no
 * rename-directory commit on the write path.
 *
 * Scale notes: the manifest holds one line per file — compaction
 * ([[compact]]) keeps file count = ceil(bytes/target), so the manifest
 * stays KB-sized while data grows; [[vacuum]] removes only data dirs no
 * retained manifest references, so a long-running reader that resolved
 * an old snapshot keeps its files until retention drops it.
 *
 * Time travel: every commit ALSO retains `manifest-<snapshot>.json`, so
 * [[readAt]] reproduces any retained snapshot byte-for-byte — for a
 * training corpus that is the provenance primitive ("the model trained
 * on snapshot X" stays answerable after the table moves on). Retention
 * is explicit: `vacuum(keepLast = n)` keeps the n newest manifests (the
 * current one always) and every data dir any of them references.
 */
object Manifest {

  private def fs(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def manifestPath(dir: String) = new Path(dir, "manifest.json")
  private def snapshotManifestPath(dir: String, snapshot: String) =
    new Path(dir, s"manifest-$snapshot.json")

  private def readManifest(fsys: FileSystem, mp: Path): Seq[String] = {
    if (!fsys.exists(mp)) return Nil
    val in = fsys.open(mp)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    // one JSON object: {"snapshot":"...","committed_at":...,"files":[...]}
    "\"([^\"]*part-[^\"]*\\.parquet)\"".r.findAllMatchIn(text).map(_.group(1)).toSeq
  }

  /** Files of the CURRENT snapshot (relative paths), or empty if the
    * table has never committed. */
  def currentFiles(spark: SparkSession, dir: String): Seq[String] =
    readManifest(fs(spark, dir)._1, manifestPath(dir))

  /** Commit sequence number embedded in a manifest — the total order of
    * commits (mod-times tie within a millisecond; a counter cannot). */
  private def commitSeq(fsys: FileSystem, mp: Path): Long = {
    if (!fsys.exists(mp)) return -1L
    val in = fsys.open(mp)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    "\"commit_seq\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(text)
      .map(_.group(1).toLong).getOrElse(-1L)
  }

  private def retainedManifests(fsys: FileSystem, base: Path): Seq[Path] =
    if (!fsys.exists(base)) Nil
    else fsys.listStatus(base).toSeq
      .map(_.getPath)
      .filter { p =>
        val n = p.getName
        n.startsWith("manifest-") && n.endsWith(".json")
      }

  /** Retained snapshot ids, oldest → newest commit order. */
  def snapshots(spark: SparkSession, dir: String): Seq[String] = {
    val (fsys, base) = fs(spark, dir)
    retainedManifests(fsys, base)
      .sortBy(p => (commitSeq(fsys, p), p.getName))
      .map(_.getName.stripPrefix("manifest-").stripSuffix(".json"))
  }

  /** Overwrite-commit: land `df` as a fresh snapshot and atomically swap
    * the manifest to it. The table transitions old→new in one rename;
    * any failure before that rename leaves the current snapshot live. */
  def write(df: DataFrame, dir: String, snapshot: String): Unit = {
    require(snapshot.matches("[A-Za-z0-9._-]+"), s"unsafe snapshot id: $snapshot")
    val spark = df.sparkSession
    val (fsys, base) = fs(spark, dir)
    val dataDir = new Path(base, s"data-$snapshot")
    require(!fsys.exists(dataDir), s"snapshot $snapshot already landed under $dir")
    df.write.parquet(dataDir.toString)
    val files = fsys.listStatus(dataDir).toSeq
      .filter(s => s.getPath.getName.startsWith("part-") &&
        s.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
    val body = files.map(s =>
        s"""    "data-$snapshot/${s.getPath.getName}"""").mkString(",\n")
    val seq = (retainedManifests(fsys, base).map(commitSeq(fsys, _)) :+ -1L).max + 1
    val json =
      s"""{
         |  "snapshot": "$snapshot",
         |  "commit_seq": $seq,
         |  "committed_at": ${System.currentTimeMillis()},
         |  "files": [
         |$body
         |  ]
         |}
         |""".stripMargin
    def land(tmpName: String, dest: Path): Unit = {
      val tmp = new Path(base, tmpName)
      val out = fsys.create(tmp, true)
      try out.write(json.getBytes(StandardCharsets.UTF_8)) finally out.close()
      fsys.delete(dest, false)
      if (!fsys.rename(tmp, dest))
        throw new RuntimeException(s"manifest commit failed for $dir @ $snapshot")
    }
    // retained history first (readable via readAt even after later commits),
    // then the commit point: one atomic rename onto the current pointer
    land(s".manifest-$snapshot.hist.tmp", snapshotManifestPath(dir, snapshot))
    land(s".manifest-$snapshot.tmp", manifestPath(dir))
  }

  /** Time travel: read a RETAINED snapshot exactly as committed. */
  def readAt(spark: SparkSession, dir: String, snapshot: String): DataFrame = {
    val (fsys, _) = fs(spark, dir)
    val files = readManifest(fsys, snapshotManifestPath(dir, snapshot))
    require(files.nonEmpty, s"no retained snapshot '$snapshot' under $dir")
    spark.read.parquet(files.map(f => s"$dir/$f"): _*)
  }

  /** Read the current snapshot — from the manifest's file list, never
    * from a directory listing. Missing manifest = empty table is an
    * error (a table that never committed should be read as absent). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val files = currentFiles(spark, dir)
    require(files.nonEmpty, s"no committed snapshot under $dir")
    spark.read.parquet(files.map(f => s"$dir/$f"): _*)
  }

  /** Compact the current snapshot into ceil(bytes/target) files AS A NEW
    * SNAPSHOT — same bytes, fewer files, and unlike
    * [[TableIO.compactDir]] the swap has no race: readers resolve either
    * manifest, each pointing at a complete file set. */
  def compact(spark: SparkSession, dir: String, snapshot: String,
      targetFileBytes: Long): Long = {
    val (fsys, base) = fs(spark, dir)
    val files = currentFiles(spark, dir)
    require(files.nonEmpty, s"no committed snapshot under $dir")
    val bytes = files.map(f => fsys.getFileStatus(new Path(base, f)).getLen).sum
    val n = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)
    val df = read(spark, dir).repartition(n.toInt)
    write(df, dir, snapshot)
    n
  }

  /** Retention: keep the `keepLast` newest retained manifests (the
    * current snapshot is always among them — it is the newest) plus
    * every data dir any of them references; delete older manifests,
    * their now-unreferenced data dirs, and orphan dirs from crashed
    * pre-commit writes. Returns the removed entries. */
  def vacuum(spark: SparkSession, dir: String, keepLast: Int = 1): Seq[String] = {
    require(keepLast >= 1, "must retain at least the current snapshot")
    val (fsys, base) = fs(spark, dir)
    val all = snapshots(spark, dir)
    val (dropSnaps, keepSnaps) = all.splitAt(math.max(0, all.size - keepLast))
    val live = keepSnaps
      .flatMap(s => readManifest(fsys, snapshotManifestPath(dir, s)))
      .map(_.split('/').head).toSet
    val goneDirs = fsys.listStatus(base).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("data-"))
      .filterNot(s => live.contains(s.getPath.getName))
      .map(_.getPath)
    goneDirs.foreach(p => fsys.delete(p, true))
    dropSnaps.foreach(s => fsys.delete(snapshotManifestPath(dir, s), false))
    goneDirs.map(_.getName) ++ dropSnaps.map(s => s"manifest-$s")
  }
}
