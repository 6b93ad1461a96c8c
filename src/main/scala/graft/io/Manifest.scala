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
 * stays KB-sized while data grows; [[vacuum]] removes unreferenced data
 * dirs strictly AFTER the manifest no longer points at them, so a
 * long-running reader that resolved the old manifest keeps its files
 * until the retention window closes (time-travel by keeping N manifests
 * would be the next rung; one current snapshot is enough for the
 * reference's land→promote contract).
 */
object Manifest {

  private def fs(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def manifestPath(dir: String) = new Path(dir, "manifest.json")

  /** Files of the CURRENT snapshot (relative paths), or empty if the
    * table has never committed. */
  def currentFiles(spark: SparkSession, dir: String): Seq[String] = {
    val (fsys, _) = fs(spark, dir)
    val mp = manifestPath(dir)
    if (!fsys.exists(mp)) return Nil
    val in = fsys.open(mp)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    // one JSON object: {"snapshot":"...","files":["data-.../part-...parquet",...]}
    "\"([^\"]*part-[^\"]*\\.parquet)\"".r.findAllMatchIn(text).map(_.group(1)).toSeq
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
    val json =
      s"""{
         |  "snapshot": "$snapshot",
         |  "files": [
         |$body
         |  ]
         |}
         |""".stripMargin
    val tmp = new Path(base, s".manifest-$snapshot.tmp")
    val out = fsys.create(tmp, true)
    try out.write(json.getBytes(StandardCharsets.UTF_8)) finally out.close()
    // the commit point: one atomic rename over the previous manifest
    fsys.delete(manifestPath(dir), false)
    if (!fsys.rename(tmp, manifestPath(dir)))
      throw new RuntimeException(s"manifest commit failed for $dir @ $snapshot")
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

  /** Delete data directories the current manifest no longer references.
    * Runs strictly after a commit, so only superseded snapshots go; a
    * retention delay (caller-side) protects in-flight readers. */
  def vacuum(spark: SparkSession, dir: String): Seq[String] = {
    val (fsys, base) = fs(spark, dir)
    val live = currentFiles(spark, dir).map(_.split('/').head).toSet
    val gone = fsys.listStatus(base).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("data-"))
      .filterNot(s => live.contains(s.getPath.getName))
      .map(_.getPath)
    gone.foreach(p => fsys.delete(p, true))
    gone.map(_.getName)
  }
}
