package graft.io

import java.net.URI
import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** RAW object-store semantics: rename is LAST-WRITER-WINS (copy +
  * delete; an existing destination is silently replaced). This is
  * exactly the regime where the manifest protocol's rename CAS stops
  * being a CAS — racing writers both "succeed" and one commit silently
  * vanishes — and where Delta requires an external LogStore. The PUT-
  * at-close visibility model is inherited from [[ObjectStoreFS]]. */
class RawObjectStoreFS extends ObjectStoreFS {
  override def getScheme: String = "s3raw"
  override def getUri: URI = URI.create("s3raw:///")

  override def rename(src: Path, dst: Path): Boolean = {
    RawObjectStoreFS.renames.add(
      (src.toUri.getPath, dst.toUri.getPath, exists(dst)))
    if (!exists(src)) return false
    if (getFileStatus(src).isDirectory) return super.rename(src, dst)
    // file rename = copy + delete, OVERWRITING any existing key
    java.nio.file.Files.move(
      pathToFile(src).toPath, pathToFile(dst).toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    true
  }
}

object RawObjectStoreFS {
  // (src, dst, dstExisted)
  val renames =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, String, Boolean)]
  def reset(): Unit = renames.clear()
}

/**
 * Proves the [[CommitCoordinator]] claims under true raw-S3 rename
 * semantics (VERDICT r12 task 2):
 *
 *  - without a coordinator the LWW rename silently loses a racing
 *    commit (the hazard is REAL, not hypothetical);
 *  - with one registered, two racing committers produce ONE winner and
 *    a rebased loser — no row lost, one claim per seq;
 *  - a winner that crashed between claim and publish is FIXED UP by
 *    the next writer from its staged object (the Delta LogStore
 *    recovery shape).
 */
class RawObjectStoreManifestSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestBase.session
    s.sparkContext.hadoopConfiguration
      .set("fs.s3raw.impl", classOf[RawObjectStoreFS].getName)
    s.sparkContext.hadoopConfiguration.set("fs.s3raw.impl.disable.cache", "true")
    s
  }
  import spark.implicits._

  private def freshTable(): String = {
    val local = Files.createTempDirectory("s3raw-manifest").toString
    s"s3raw:$local/tbl"
  }

  private def fs(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("WITHOUT a coordinator, last-writer-wins rename loses a racing commit") {
    CommitCoordinator.unregister("s3raw")
    val dir = freshTable()
    Manifest.write(Seq(1).toDF("v"), dir, "base")
    // SAME-JVM racers are serialized by the manifest layer's TOCTOU
    // guard (round 13: exists+rename under one JVM lock per commit
    // key), so the in-process interleaving that used to demonstrate
    // the loss now refuses cleanly. The REAL remaining hazard is
    // CROSS-PROCESS — no JVM lock can reach another writer — so it is
    // demonstrated at the FS layer: two "processes" each stage a
    // manifest for seq 1 and rename; both renames report success, the
    // second silently REPLACING the first. An acknowledged commit is
    // gone. This is exactly why raw-LWW schemes need the registered
    // coordinator.
    val f = fs(dir)
    def stage(name: String, snap: String): Path = {
      val p = new Path(dir, name)
      val o = f.create(p, true)
      o.write(
        s"""{"snapshot":"$snap","commit_seq":1,"files":["data-$snap/part-0.parquet"]}"""
          .getBytes("UTF-8"))
      o.close(); p
    }
    val dest = new Path(dir, "manifest-1.json")
    val a = stage(".ma.tmp", "procA")
    val b = stage(".mb.tmp", "procB")
    assert(f.rename(a, dest), "first committer publishes")
    assert(f.rename(b, dest),
      "LWW: the second rename also reports success instead of refusing")
    val hist = Manifest.history(spark, dir)
    assert(hist.map(_.snapshot) == Seq("base", "procB"),
      "procA's acknowledged commit silently vanished under LWW rename")
  }

  test("WITH a coordinator: one winner per seq, the loser rebases; no row lost") {
    val coord = new InProcessCommitCoordinator
    CommitCoordinator.register("s3raw", coord)
    try {
      val dir = freshTable()
      Manifest.write(Seq(1).toDF("v"), dir, "base")
      // same interleaving as above: B fully commits inside A's window
      // (once — A's rebase retry re-fires the hook). A's claim for
      // seq 1 now LOSES; the plain-append retry rebases A onto seq 2 —
      // both rows survive.
      val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
      Manifest.appendImpl(Seq(2).toDF("v"), dir, "a", () =>
        if (fired.compareAndSet(false, true))
          Manifest.append(Seq(3).toDF("v"), dir, "b"))
      val hist = Manifest.history(spark, dir)
      assert(hist.map(_.seq) == Seq(0L, 1L, 2L))
      assert(hist.map(_.snapshot) == Seq("base", "b", "a"),
        "B won seq 1 (committed inside A's window); A rebased onto seq 2")
      assert(Manifest.read(spark, dir).as[Int].collect().sorted.toSeq ==
        Seq(1, 2, 3), "no commit may vanish under a coordinator")
      // exactly one claim records each seq
      assert(coord.claimFor(dir, 1L).isDefined &&
        coord.claimFor(dir, 2L).isDefined)
    } finally CommitCoordinator.unregister("s3raw")
  }

  test("a crashed winner (claim without publish) is fixed up from its staged object") {
    val coord = new InProcessCommitCoordinator
    CommitCoordinator.register("s3raw", coord)
    try {
      val dir = freshTable()
      Manifest.write(Seq(1).toDF("v"), dir, "base")
      // simulate the crash: stage a complete manifest for seq 1 and
      // claim it, but never publish (the writer died right after the
      // putIfAbsent)
      val fsys = fs(dir)
      val staged = new Path(dir, ".manifest-crashed.tmp")
      val json =
        """{
          |  "snapshot": "crashed",
          |  "commit_seq": 1,
          |  "committed_at": 42,
          |  "files": [
          |    "data-base/%s"
          |  ]
          |}
          |""".stripMargin.format(
          Manifest.currentFiles(spark, dir).head.split('/').last)
      val out = fsys.create(staged, true)
      try out.write(json.getBytes("UTF-8")) finally out.close()
      assert(coord.claim(dir, 1L, staged.toString).won)
      // the table still reads at seq 0 (claimed-but-unpublished is
      // invisible to readers)
      assert(Manifest.history(spark, dir).map(_.seq) == Seq(0L))
      // the NEXT writer computes seq 1, loses the claim, fixes up the
      // crashed winner's publish from its staged object, and rebases
      Manifest.append(Seq(9).toDF("v"), dir, "next")
      val hist = Manifest.history(spark, dir)
      assert(hist.map(_.seq) == Seq(0L, 1L, 2L))
      assert(hist.map(_.snapshot) == Seq("base", "crashed", "next"),
        "the crashed winner's commit must be completed, not lost")
      assert(Manifest.read(spark, dir).as[Int].collect().sorted.toSeq ==
        Seq(1, 9))
    } finally CommitCoordinator.unregister("s3raw")
  }
}
