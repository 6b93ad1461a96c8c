package graft.io

import java.net.URI
import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicBoolean

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** A test-only Hadoop FileSystem with OBJECT-STORE rename semantics:
  * rename onto an existing key is refused (S3 has no atomic overwrite-
  * rename), every rename and listStatus is recorded for assertions, and
  * renames publishing a `manifest-*` key can be forced to fail — the
  * writer-dies-at-the-commit-point probe. Data lives on the local disk;
  * only the SEMANTICS are object-store-shaped. */
class ObjectStoreFS extends RawLocalFileSystem {
  override def getScheme: String = "s3mock"
  override def getUri: URI = URI.create("s3mock:///")

  override def rename(src: Path, dst: Path): Boolean = {
    ObjectStoreFS.renames.add((src.toUri.getPath, dst.toUri.getPath,
      exists(dst), getFileStatus(src).isDirectory))
    if (dst.getName.startsWith("manifest-") && ObjectStoreFS.failCommit.get())
      return false
    if (exists(dst)) return false // no overwrite-rename on an object store
    super.rename(src, dst)
  }

  override def listStatus(p: Path): Array[org.apache.hadoop.fs.FileStatus] = {
    ObjectStoreFS.lists.add(p.toUri.getPath)
    super.listStatus(p)
  }
}

object ObjectStoreFS {
  // (src, dst, dstExisted, srcWasDir)
  val renames = new ConcurrentLinkedQueue[(String, String, Boolean, Boolean)]
  val lists = new ConcurrentLinkedQueue[String]
  val failCommit = new AtomicBoolean(false)
  def reset(): Unit = { renames.clear(); lists.clear(); failCommit.set(false) }
}

/** Proves the [[Manifest]] design claims against object-store rename
  * semantics instead of asserting them in prose: the commit point is one
  * FILE rename onto a key that never existed, a commit-point failure
  * leaves the previous snapshot live, and reads resolve the file set
  * from manifests alone — no LIST over the data tree. */
class ObjectStoreManifestSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestBase.session
    s.sparkContext.hadoopConfiguration
      .set("fs.s3mock.impl", classOf[ObjectStoreFS].getName)
    // cached FileSystem instances would bypass a late impl registration,
    // so actually DISABLE the cache ("true") for this scheme
    s.sparkContext.hadoopConfiguration.set("fs.s3mock.impl.disable.cache", "true")
    s
  }
  import spark.implicits._

  private def freshTable(): String = {
    val local = Files.createTempDirectory("s3mock-manifest").toString
    s"s3mock:$local/tbl" // authority-less: RawLocalFileSystem's checkPath
  }

  test("commit on an object store is one file rename onto a never-existing manifest key") {
    ObjectStoreFS.reset()
    val dir = freshTable()
    Manifest.write((1 to 100).toDF("v"), dir, "s1")
    Manifest.write((101 to 200).toDF("v"), dir, "s2")

    val manifestRenames = ObjectStoreFS.renames.asScala
      .filter(_._2.contains("/manifest-")).toSeq
    // commit keys are seq-numbered (the CAS key), not snapshot-named
    assert(manifestRenames.map(_._2.split('/').last).sorted ===
      Seq("manifest-0.json", "manifest-1.json"))
    // the commit rename: dst never existed, src is a FILE — the two
    // properties that make the publish atomic-per-object on S3
    manifestRenames.foreach { case (src, _, dstExisted, srcWasDir) =>
      assert(!dstExisted, s"commit renamed onto an existing key from $src")
      assert(!srcWasDir, s"commit renamed a directory from $src")
    }
    // and no rename anywhere targeted an existing key (no delete-then-
    // rename dance hiding elsewhere in the write path either)
    assert(ObjectStoreFS.renames.asScala.count(_._3) === 0)

    assert(Manifest.read(spark, dir).count() === 100L)
    assert(Manifest.readAt(spark, dir, "s1").as[Int].collect().sum === (1 to 100).sum)
  }

  test("a writer dying at the commit point leaves the previous snapshot live") {
    ObjectStoreFS.reset()
    val dir = freshTable()
    Manifest.write((1 to 50).toDF("v"), dir, "base")

    ObjectStoreFS.failCommit.set(true)
    intercept[RuntimeException] {
      Manifest.write((51 to 90).toDF("v"), dir, "doomed")
    }
    ObjectStoreFS.failCommit.set(false)

    // reader still resolves the base snapshot; the orphan data dir is
    // invisible (and vacuum-able after the grace window)
    assert(Manifest.snapshots(spark, dir) === Seq("base"))
    assert(Manifest.read(spark, dir).count() === 50L)
    // retrying the snapshot id is refused (data landed), a FRESH id commits
    intercept[IllegalArgumentException] {
      Manifest.write((51 to 90).toDF("v"), dir, "doomed")
    }
    Manifest.write((51 to 90).toDF("v"), dir, "retry")
    assert(Manifest.read(spark, dir).count() === 40L)
  }

  test("snapshot resolution lists only manifest keys, never the data tree") {
    ObjectStoreFS.reset()
    val dir = freshTable()
    Manifest.write((1 to 60).toDF("v"), dir, "s1")

    ObjectStoreFS.lists.clear()
    val files = Manifest.currentFiles(spark, dir)
    assert(files.nonEmpty)
    val listed = ObjectStoreFS.lists.asScala.toSeq
    assert(listed.nonEmpty)
    // resolution = LIST of the KB-sized manifest keys at the table root;
    // at 100 TB the data tree holds millions of keys — listing it on
    // every read is the object-store pathology the design kills
    assert(!listed.exists(_.contains("/data-")),
      s"snapshot resolution listed the data tree: $listed")
  }
}
