package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.io.Manifest

/**
 * MERGE-ON-READ SQL DML (round 13): tables opted in via
 * `graft.dml.mode = mor` run DELETE as a position-delete write and
 * UPDATE as updated-copies + position deletes — the deletion-vector
 * shape: cost ∝ changed rows, touched data files never rewrite. At
 * 100 TB this is the difference between a GDPR delete writing
 * kilobytes and rewriting every overlapping file. COW stays the
 * default (vectorized scans, no compaction debt); subquery conditions
 * keep the COW path.
 */
class GraftMorDmlSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestBase.session
    val wh = java.nio.file.Files.createTempDirectory("graftwh_mor").toString
    s.conf.set("spark.sql.catalog.gmor", "graft.catalog.GraftCatalog")
    s.conf.set("spark.sql.catalog.gmor.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gmor.db")
    s.conf.set("graft.test.morwh", wh)
    s
  }
  import spark.implicits._

  private def wh = spark.conf.get("graft.test.morwh")
  private def sql(q: String) = spark.sql(q)

  private def filesOf(dir: String) = Manifest.currentFiles(spark, dir)

  private def cdf(dir: String, since: String): DataFrame =
    spark.read.format("graft")
      .option("readChangeFeed", "true").option("changesSince", since)
      .load(dir)

  private def byType(df: DataFrame): Map[String, Long] =
    df.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("MOR DELETE: positions written, no data file moves, reads serve live rows") {
    sql("""CREATE TABLE gmor.db.d USING graft
          |TBLPROPERTIES ('graft.dml.mode' = 'mor')
          |AS SELECT id, id * 10 AS v FROM range(0, 1000)""".stripMargin)
    val dir = s"$wh/db/d"
    val before = filesOf(dir)
    val baseSnap = Manifest.snapshots(spark, dir).last
    sql("DELETE FROM gmor.db.d WHERE id >= 100 AND id < 150")
    // every data file carries by reference; only a position list landed
    assert(filesOf(dir) == before, "MOR delete must not move data files")
    val hist = Manifest.history(spark, dir)
    assert(hist.last.deleteFiles.nonEmpty &&
      hist.last.deleteFiles.forall(_.startsWith("deletes-")))
    assert(sql("SELECT COUNT(*) FROM gmor.db.d").head.getLong(0) == 950)
    assert(sql("SELECT COUNT(*) FROM gmor.db.d WHERE id >= 100 AND id < 150")
      .head.getLong(0) == 0)
    // the change feed serves the deletion from the recorded cdc
    val feed = cdf(dir, baseSnap)
    assert(feed.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap == Map("delete" -> 50L))
    // time travel below the delete still serves the full state
    assert(Manifest.readAt(spark, dir, baseSnap).count() == 1000)
    // a second OVERLAPPING delete records only the newly-dead rows
    val mid = Manifest.snapshots(spark, dir).last
    sql("DELETE FROM gmor.db.d WHERE id >= 120 AND id < 200")
    assert(sql("SELECT COUNT(*) FROM gmor.db.d").head.getLong(0) == 900)
    assert(cdf(dir, mid).count() == 50, // 150..199 — 120..149 already dead
      "already-deleted rows must not re-record in the change feed")
    // compaction purges the MOR state and the feed reads it as empty
    val preCompact = Manifest.snapshots(spark, dir).last
    Manifest.compact(spark, dir, "squash", 1L << 30)
    assert(Manifest.history(spark, dir).last.deleteFiles.isEmpty)
    assert(sql("SELECT COUNT(*) FROM gmor.db.d").head.getLong(0) == 900)
    assert(cdf(dir, preCompact).count() == 0)
  }

  test("MOR DELETE of every row is representable (COW refuses it)") {
    sql("""CREATE TABLE gmor.db.all USING graft
          |TBLPROPERTIES ('graft.dml.mode' = 'mor')
          |AS SELECT id FROM range(0, 10)""".stripMargin)
    sql("DELETE FROM gmor.db.all WHERE id >= 0")
    assert(sql("SELECT COUNT(*) FROM gmor.db.all").head.getLong(0) == 0)
  }

  test("MOR UPDATE: updated copies land, originals position-delete, one commit") {
    sql("""CREATE TABLE gmor.db.u USING graft
          |TBLPROPERTIES ('graft.dml.mode' = 'mor')
          |AS SELECT id, CAST(id * 10 AS BIGINT) AS v,
          |     CAST(id % 3 AS INT) AS k FROM range(0, 900)""".stripMargin)
    val dir = s"$wh/db/u"
    val before = filesOf(dir)
    val baseSnap = Manifest.snapshots(spark, dir).last
    sql("UPDATE gmor.db.u SET v = v + 1 WHERE id < 30")
    val m = Manifest.history(spark, dir).last
    // the original files all carry; the new files hold ONLY the 30 copies
    assert(before.forall(m.files.contains))
    val newFiles = m.files.filterNot(before.toSet)
    assert(newFiles.nonEmpty && m.deleteFiles.nonEmpty)
    assert(spark.read.parquet(newFiles.map(f => s"$dir/$f"): _*).count() == 30)
    // read state: exactly the updated values, no duplicates
    assert(sql("SELECT COUNT(*) FROM gmor.db.u").head.getLong(0) == 900)
    assert(sql("SELECT SUM(v) FROM gmor.db.u").head.getLong(0) ==
      (0L until 900L).map(_ * 10).sum + 30)
    // change feed: pre/post pairs from the recorded cdc
    val byType = cdf(dir, baseSnap).groupBy("_change_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("update_preimage" -> 30L, "update_postimage" -> 30L))
    // a second update over rows INCLUDING already-updated ones reads
    // through the MOR state (live rows only — no resurrected originals)
    sql("UPDATE gmor.db.u SET v = 0 WHERE id < 10")
    assert(sql("SELECT SUM(v) FROM gmor.db.u WHERE id < 30").head.getLong(0) ==
      (10L until 30L).map(_ * 10 + 1).sum)
    // time travel below the updates serves the original state
    assert(Manifest.readAt(spark, dir, baseSnap)
      .agg(sum("v")).head.getLong(0) == (0L until 900L).map(_ * 10).sum)
  }

  test("MOR UPDATE preserves hive partition layout for the updated copies") {
    sql("""CREATE TABLE gmor.db.p (id BIGINT, v BIGINT, k INT) USING graft
          |PARTITIONED BY (k)
          |TBLPROPERTIES ('graft.dml.mode' = 'mor')""".stripMargin)
    sql("""INSERT INTO gmor.db.p
          |SELECT id, id * 10, CAST(id % 4 AS INT) FROM range(0, 400)""".stripMargin)
    val dir = s"$wh/db/p"
    sql("UPDATE gmor.db.p SET v = -1 WHERE id < 8")
    val hist = Manifest.history(spark, dir)
    val m = hist.last
    // the updated copies landed under k=<value>/ dirs (layout preserved)
    val updatedDirs = m.files.filterNot(hist.head.files.toSet)
    assert(updatedDirs.nonEmpty && updatedDirs.forall(_.contains("k=")))
    assert(sql("SELECT COUNT(*) FROM gmor.db.p WHERE v = -1").head.getLong(0) == 8)
    // partition-pruned reads still work over the MOR state
    assert(sql("SELECT COUNT(*) FROM gmor.db.p WHERE k = 1").head.getLong(0) == 100)
  }

  test("MOR MERGE: an upsert writes only the changed rows; touched files carry") {
    sql("""CREATE TABLE gmor.db.mg (k INT, name STRING, v INT) USING graft
          |TBLPROPERTIES ('graft.dml.mode' = 'mor')""".stripMargin)
    sql("""INSERT INTO gmor.db.mg
          |SELECT CAST(id AS INT), CONCAT('n', id), CAST(id * 10 AS INT)
          |FROM range(0, 400)""".stripMargin)
    val dir = s"$wh/db/mg"
    val before = filesOf(dir)
    val baseSnap = Manifest.snapshots(spark, dir).last
    Seq((2, 222), (3, -1), (900, 9000)).toDF("k", "nv")
      .createOrReplaceTempView("gmor_mg_src")
    sql("""MERGE INTO gmor.db.mg t USING gmor_mg_src s ON t.k = s.k
          |WHEN MATCHED AND s.nv < 0 THEN DELETE
          |WHEN MATCHED THEN UPDATE SET v = s.nv
          |WHEN NOT MATCHED THEN INSERT (k, name, v) VALUES (s.k, 'new', s.nv)
          |""".stripMargin)
    val m = Manifest.history(spark, dir).last
    // every pre-merge file carries; the new files hold ONLY the
    // updated copy + the insert; the originals position-delete
    assert(before.forall(m.files.contains), "MOR merge must carry all files")
    val newFiles = m.files.filterNot(before.toSet)
    assert(newFiles.nonEmpty && m.deleteFiles.nonEmpty)
    assert(spark.read.parquet(newFiles.map(f => s"$dir/$f"): _*).count() == 2)
    // state: 400 - 1 deleted + 1 inserted
    assert(sql("SELECT COUNT(*) FROM gmor.db.mg").head.getLong(0) == 400)
    assert(sql("SELECT v FROM gmor.db.mg WHERE k = 2").head.getInt(0) == 222)
    assert(sql("SELECT COUNT(*) FROM gmor.db.mg WHERE k = 3").head.getLong(0) == 0)
    assert(sql("SELECT name FROM gmor.db.mg WHERE k = 900").head.getString(0) == "new")
    // the change feed serves the merge from its recorded cdc
    assert(byType(cdf(dir, baseSnap)) == Map("update_preimage" -> 1L,
      "update_postimage" -> 1L, "delete" -> 1L, "insert" -> 1L))
    // a SECOND merge over the now-pending delete state falls back to
    // COW (clean provenance required) — still correct, rewrite-flagged
    Seq((5, 555)).toDF("k", "nv").createOrReplaceTempView("gmor_mg_src2")
    sql("""MERGE INTO gmor.db.mg t USING gmor_mg_src2 s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET v = s.nv
          |""".stripMargin)
    assert(sql("SELECT v FROM gmor.db.mg WHERE k = 5").head.getInt(0) == 555)
    assert(sql("SELECT COUNT(*) FROM gmor.db.mg").head.getLong(0) == 400)
    // compaction restores MOR-merge eligibility
    Manifest.compact(spark, dir, "mg-squash", 1L << 30)
    val before3 = filesOf(dir)
    Seq((7, 777)).toDF("k", "nv").createOrReplaceTempView("gmor_mg_src3")
    sql("""MERGE INTO gmor.db.mg t USING gmor_mg_src3 s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET v = s.nv
          |""".stripMargin)
    assert(before3.forall(Manifest.history(spark, dir).last.files.contains))
    assert(sql("SELECT v FROM gmor.db.mg WHERE k = 7").head.getInt(0) == 777)
  }

  test("streams refuse across a MOR DML commit; subquery conditions fall back to COW") {
    sql("""CREATE TABLE gmor.db.s USING graft
          |TBLPROPERTIES ('graft.dml.mode' = 'mor')
          |AS SELECT id FROM range(0, 100)""".stripMargin)
    val dir = s"$wh/db/s"
    // subquery condition: COW fallback (files rewrite, no delete state)
    Seq(5L, 6L).toDF("x").createOrReplaceTempView("mor_subq_keys")
    sql("DELETE FROM gmor.db.s WHERE id IN (SELECT x FROM mor_subq_keys)")
    val afterSubq = Manifest.history(spark, dir).last
    assert(afterSubq.deleteFiles.isEmpty && afterSubq.rewrite,
      "subquery conditions keep the COW path")
    assert(sql("SELECT COUNT(*) FROM gmor.db.s").head.getLong(0) == 98)
    // plain condition: MOR; an append-only incremental read refuses
    val base = Manifest.snapshots(spark, dir).last
    sql("DELETE FROM gmor.db.s WHERE id < 3")
    val err = intercept[IllegalStateException](
      Manifest.readChangesSince(spark, dir, base))
    assert(err.getMessage.contains("delete state"))
    // …while the change feed serves it
    assert(cdf(dir, base).count() == 3)
  }
}
