package graft.sources

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.io.{Manifest, ObjectStoreFS}

/**
 * The round-9 public faces under OBJECT-STORE semantics (the
 * [[graft.io.ObjectStoreFS]] mock: no overwrite-rename, PUT-at-close
 * visibility, recorded renames/listings) — the strongest evidence this
 * no-egress sandbox allows that `spark.read/write.format("graft")` and
 * the streaming relay keep the manifest's S3-shaped commit contract
 * when driven through the Spark APIs instead of library calls.
 */
class ObjectStoreGraftSourceSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestBase.session
    s.sparkContext.hadoopConfiguration
      .set("fs.s3mock.impl", classOf[ObjectStoreFS].getName)
    s.sparkContext.hadoopConfiguration
      .set("fs.s3mock.impl.disable.cache", "true")
    s
  }
  import spark.implicits._

  private def freshTable(tag: String): String = {
    val local = Files.createTempDirectory(s"s3mock-$tag").toString
    s"s3mock:$local/tbl"
  }

  test("format(\"graft\") writes commit via CAS renames; reads stay vectorized and pruned") {
    ObjectStoreFS.reset()
    val dir = freshTable("gsrc")
    spark.range(0, 1000).toDF("id")
      .repartitionByRange(5, org.apache.spark.sql.functions.col("id"))
      .write.format("graft").mode("overwrite").save(dir)
    (2000L to 2029L).toDF("id").write.format("graft").mode("append").save(dir)
    // the Spark-API write path kept the commit contract: every manifest
    // publish renamed a FILE onto a key that never existed
    val commits = ObjectStoreFS.renames.asScala
      .filter(_._2.contains("/manifest-")).toSeq
    assert(commits.map(_._2.split('/').last).sorted ==
      Seq("manifest-0.json", "manifest-1.json"))
    commits.foreach { case (src, _, dstExisted, srcWasDir) =>
      assert(!dstExisted && !srcWasDir, s"non-CAS commit from $src")
    }
    // read through the source: correct rows, native vectorized scan
    val g = spark.read.format("graft").load(dir)
    assert(g.count() == 1030)
    val plan = g.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    assert(plan.collectLeaves().exists(_.isInstanceOf[FileSourceScanExec]),
      "the object-store read must still plan as a native file scan")
    // stats pruning works over the mock (the footer pass runs in tasks
    // against the s3mock scheme)
    val slice = g.where("id >= 100 AND id <= 199")
    assert(slice.count() == 100)
    // time travel through the API
    assert(spark.read.format("graft")
      .option("versionAsOf", "0").load(dir).count() == 1000)
    // snapshot resolution never ENUMERATES a data directory — the scan
    // touches exactly the manifest-listed .parquet keys (file-level
    // status probes), which is the point: no LIST over unknown keys
    ObjectStoreFS.lists.clear()
    spark.read.format("graft").load(dir).count()
    val dirListings = ObjectStoreFS.lists.asScala
      .filter(p => p.contains("/data-") && !p.endsWith(".parquet"))
    assert(dirListings.isEmpty,
      s"read resolution enumerated a data directory: $dirListings")
  }

  test("streaming relay graft→graft over the object store commits exactly-once") {
    ObjectStoreFS.reset()
    val src = freshTable("gstream-src")
    val out = freshTable("gstream-out")
    val ckpt = Files.createTempDirectory("gstream-ckpt").toString
    Manifest.write((1 to 80).toDF("v"), src, "s0")
    def drain(): Unit =
      spark.readStream.format("graft").load(src)
        .writeStream.format("graft").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start().awaitTermination()
    drain()
    assert(Manifest.snapshots(spark, out)
      .map(_.matches("stream-q[0-9a-f]{8}-b0")) == Seq(true))
    assert(Manifest.read(spark, out).count() == 80)
    Manifest.append((100 to 119).toDF("v"), src, "s1")
    drain()
    assert(Manifest.read(spark, out).as[Int].collect().sorted.toSeq ==
      ((1 to 80) ++ (100 to 119)))
    // every sink commit was a CAS rename onto a fresh key
    assert(ObjectStoreFS.renames.asScala
      .filter(t => t._2.contains(out.split(':').last) &&
        t._2.contains("/manifest-")).forall(!_._3),
      "a sink commit renamed onto an existing key")
  }

  test("the V2 catalog runs end-to-end over the object store: DDL sidecar " +
      "PUT-at-close, CAS commits, time travel, DML") {
    ObjectStoreFS.reset()
    val wh = s"s3mock:${Files.createTempDirectory("s3mock-cat")}/wh"
    spark.conf.set("spark.sql.catalog.oscat", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.oscat.warehouse", wh)
    spark.sql("CREATE NAMESPACE oscat.db")
    spark.range(0, 300).toDF("id")
      .withColumn("seg", org.apache.spark.sql.functions.expr(
        "CASE WHEN id % 2 = 0 THEN 'e' ELSE 'o' END"))
      .createOrReplaceTempView("oscat_src")
    spark.sql("CREATE TABLE oscat.db.t USING graft PARTITIONED BY (seg) " +
      "AS SELECT id, seg FROM oscat_src")
    spark.sql("INSERT INTO oscat.db.t SELECT -id, seg FROM oscat_src " +
      "WHERE id % 10 = 0")
    spark.sql("DELETE FROM oscat.db.t WHERE id >= 200")
    assert(spark.sql("SELECT count(*) FROM oscat.db.t")
      .collect().head.getLong(0) == 200 + 30)
    assert(spark.sql("SELECT count(*) FROM oscat.db.t VERSION AS OF 0")
      .collect().head.getLong(0) == 300)
    assert(spark.sql("SHOW TABLES IN oscat.db").collect()
      .map(_.getString(1)).toSeq == Seq("t"))
    // every manifest commit (CTAS, INSERT, DML rewrite) was a CAS rename
    // onto a fresh key
    val commits = ObjectStoreFS.renames.asScala
      .filter(_._2.contains("/manifest-")).toSeq
    assert(commits.size == 3 && commits.forall(!_._3),
      s"catalog commits must be fresh-key CAS renames: $commits")
    spark.sql("DROP TABLE oscat.db.t")
    assert(!spark.catalog.tableExists("oscat.db.t"))
  }
}
