package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.io.Manifest

/**
 * The `spark.read.format("graft")` face: reads resolve through the
 * manifest (never a directory listing), time travel via options,
 * partition + stats pruning driven by the PLANNER's pushed filters
 * (asserted on the executed scan's own metrics), merge-on-read deletes
 * applied, SQL via temp view, and an accurate sizeInBytes that lets a
 * small snapshot auto-broadcast under a join.
 */
class GraftSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.session
  import spark.implicits._

  private def tmpDir() =
    java.nio.file.Files.createTempDirectory("graftsrc").toString

  /** Execute and return the (post-AQE) file scan's numFiles metric. */
  private def scannedFiles(df: DataFrame): Long = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scan = plan.collectLeaves().collectFirst {
      case s: FileSourceScanExec => s
    }.getOrElse(fail("no FileSourceScanExec in the executed plan — " +
      "the graft relation did not plan as a native file scan"))
    scan.metrics("numFiles").value
  }

  test("reads the current snapshot through the manifest; orphan data dirs invisible") {
    val dir = tmpDir()
    Manifest.write((1 to 100).toDF("v"), dir, "s1")
    Manifest.write((1 to 40).toDF("v"), dir, "s2")
    // an orphan data dir (crashed pre-commit write) must stay invisible
    val orphan = new java.io.File(dir, "data-orphan"); orphan.mkdirs()
    (900 to 950).toDF("v").write.parquet(s"$dir/data-orphan/junk")
    val df = spark.read.format("graft").load(dir)
    assert(df.as[Int].collect().sorted.toSeq == (1 to 40))
    // the plan is Spark's native vectorized parquet scan
    assert(scannedFiles(df) > 0)
  }

  test("time travel: versionAsOf, snapshotAsOf, timestampAsOf") {
    val dir = tmpDir()
    Manifest.write((1 to 10).toDF("v"), dir, "first")
    Thread.sleep(15)
    val mid = System.currentTimeMillis()
    Thread.sleep(15)
    Manifest.write((1 to 25).toDF("v"), dir, "second")
    assert(spark.read.format("graft")
      .option("versionAsOf", "0").load(dir).count() == 10)
    assert(spark.read.format("graft")
      .option("snapshotAsOf", "second").load(dir).count() == 25)
    assert(spark.read.format("graft")
      .option("timestampAsOf", mid.toString).load(dir).count() == 10)
    intercept[IllegalArgumentException] {
      spark.read.format("graft").option("versionAsOf", "99").load(dir)
    }
    intercept[IllegalArgumentException] {
      spark.read.format("graft").option("versionAsOf", "0")
        .option("snapshotAsOf", "first").load(dir)
    }
  }

  test("changesSince: the incremental read is a restricted fast-path scan; rewrites refuse") {
    val dir = tmpDir()
    Manifest.write((1 to 100).toDF("v"), dir, "base")
    Manifest.append((101 to 130).toDF("v"), dir, "b1")
    Manifest.append((131 to 140).toDF("v"), dir, "b2")
    // the delta after 'base' = exactly the two appended batches
    val delta = spark.read.format("graft")
      .option("changesSince", "base").load(dir)
    assert(delta.as[Int].collect().sorted.toSeq == (101 to 140))
    // it rides the same vectorized scan, over FEWER files
    assert(scannedFiles(delta) > 0)
    // mid-history baseline
    assert(spark.read.format("graft").option("changesSince", "b1").load(dir)
      .as[Int].collect().sorted.toSeq == (131 to 140))
    // current baseline: zero rows, full schema (not an error)
    val none = spark.read.format("graft")
      .option("changesSince", "b2").load(dir)
    assert(none.columns.toSeq == Seq("v") && none.count() == 0)
    // unknown baseline / time-travel combination refuse loudly
    intercept[IllegalArgumentException] {
      spark.read.format("graft").option("changesSince", "nope").load(dir)
    }
    intercept[IllegalArgumentException] {
      spark.read.format("graft").option("changesSince", "base")
        .option("versionAsOf", "0").load(dir)
    }
    // a rewrite in the span refuses: its files re-pack served rows
    Manifest.compact(spark, dir, "c1", 128L * 1024 * 1024)
    val e = intercept[IllegalStateException] {
      spark.read.format("graft").option("changesSince", "base").load(dir)
    }
    assert(e.getMessage.contains("re-baseline"))
    // re-baselining on the rewrite works
    Manifest.append(Seq(999).toDF("v"), dir, "b3")
    assert(spark.read.format("graft").option("changesSince", "c1").load(dir)
      .as[Int].collect().toSeq == Seq(999))
    // a merge-on-read DELETE in the span refuses too (ADVICE r12): it
    // is NOT rewrite-flagged, yet its position deletes can target the
    // very files the span appended — the bare file diff would serve
    // rows the span itself deleted as live changes
    Manifest.append((2000 to 2010).toDF("v"), dir, "b4")
    Manifest.deleteRangeMOR(spark, dir, "v", "2005", "2010", "mor1")
    val e2 = intercept[IllegalStateException] {
      spark.read.format("graft").option("changesSince", "b3").load(dir)
        .collect()
    }
    assert(e2.getMessage.contains("delete state"))
    // the library face shares the guard
    val e3 = intercept[IllegalStateException] {
      Manifest.readChangesSince(spark, dir, "b3")
    }
    assert(e3.getMessage.contains("delete state"))
    // a baseline AT the MOR commit serves later appends again
    Manifest.append(Seq(3000).toDF("v"), dir, "b5")
    assert(spark.read.format("graft").option("changesSince", "mor1").load(dir)
      .as[Int].collect().toSeq == Seq(3000))
  }

  test("partition filters prune to the matching hive directories only") {
    val dir = tmpDir()
    val df = spark.sql(
      """SELECT id, CASE CAST(id % 3 AS INT) WHEN 0 THEN 'de'
        |  WHEN 1 THEN 'en' ELSE 'fr' END AS lang
        |FROM range(0, 300)""".stripMargin)
    Manifest.writePartitioned(df, dir, "p1", Seq("lang"))
    val g = spark.read.format("graft").load(dir)
    assert(g.columns.toSet == Set("id", "lang"))
    val all = scannedFiles(g)
    val en = g.where("lang = 'en'")
    assert(en.count() == 100)
    assert(scannedFiles(en) < all,
      "a partition-exact filter must scan fewer files")
    assert(en.select("id").as[Long].collect().forall(_ % 3 == 1))
    assert(g.where("lang = 'zz'").count() == 0)
  }

  test("data filters prune files by footer bounds on a clustered layout") {
    val dir = tmpDir()
    Manifest.write(
      spark.range(0, 1000).toDF("id").repartitionByRange(5, col("id")),
      dir, "clustered")
    val g = spark.read.format("graft").load(dir)
    val all = scannedFiles(g)
    assert(all == 5)
    val slice = g.where("id >= 100 AND id <= 299")
    assert(slice.count() == 200)
    assert(scannedFiles(slice) < all,
      "range bounds must prune files the window cannot touch")
    // fail-open contract: an unprunable predicate scans everything and
    // still answers correctly
    assert(g.where("id % 7 = 0").count() == 143)
  }

  test("merge-on-read snapshots apply position deletes through the source") {
    val dir = tmpDir()
    Manifest.write(
      spark.range(0, 100).toDF("id").repartitionByRange(2, col("id")),
      dir, "base")
    Manifest.deleteRangeMOR(spark, dir, "id", "10", "19", "mor")
    val g = spark.read.format("graft").load(dir)
    assert(g.count() == 90)
    assert(g.where("id >= 10 AND id <= 19").count() == 0)
    // column pruning still pushes on the MOR path
    assert(g.select("id").columns.toSeq == Seq("id"))
    // time travel below the delete sees the pre-delete state (and rides
    // the fast vectorized path again)
    assert(spark.read.format("graft")
      .option("versionAsOf", "0").load(dir).count() == 100)
    // compaction purges the delete state; the fast path resumes
    Manifest.compact(spark, dir, "purged", Long.MaxValue)
    assert(spark.read.format("graft").load(dir).count() == 90)
  }

  test("MOR reads push filters into the inner scan: partition pruning survives delete state") {
    val dir = tmpDir()
    Manifest.writePartitioned(
      spark.range(0, 1000).toDF("id")
        .withColumn("k", col("id") % 4),
      dir, "base", Seq("k"))
    Manifest.deleteRangeMOR(spark, dir, "id", "0", "7", "mor")
    val g = spark.read.format("graft").load(dir)

    // input rows the executed job actually materialized from its scans —
    // the observable difference between "filter re-checked above a full
    // scan" (reads everything) and "filter planted under the anti-join"
    // (partition dirs prune at listing, row groups skip on bounds)
    def scanRecords(action: => Unit): Long = {
      val records = new java.util.concurrent.atomic.AtomicLong
      val lsn = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (te.taskMetrics != null)
            records.addAndGet(te.taskMetrics.inputMetrics.recordsRead)
      }
      spark.sparkContext.addSparkListener(lsn)
      try {
        action
        // drain the listener bus: poll until the counter stops moving
        var prev = -1L
        var spins = 0
        while (records.get() != prev && spins < 100) {
          prev = records.get(); spins += 1; Thread.sleep(50)
        }
        records.get()
      } finally spark.sparkContext.removeSparkListener(lsn)
    }

    val fullRead = scanRecords {
      assert(g.count() == 992) // 1000 minus the 8 MOR-deleted rows
    }
    val prunedRead = scanRecords {
      assert(g.where("k = 1").count() == 248) // 250 ids 1,5,…; 1 and 5 deleted
    }
    assert(prunedRead * 2 < fullRead,
      s"a k=1 read of a MOR snapshot must scan ~1/4 of the rows, not " +
        s"re-filter a full scan (pruned=$prunedRead, full=$fullRead)")
  }

  test("MOR reads plan as VECTORIZED scans (no V1 row boundary); INSERT and DML " +
      "targets keep the relation") {
    val dir = tmpDir()
    Manifest.write(spark.range(0, 200).toDF("id")
      .repartitionByRange(2, col("id")), dir, "base")
    Manifest.deleteRangeMOR(spark, dir, "id", "10", "19", "mor")
    val q = spark.read.format("graft").load(dir).where("id < 100")
    assert(q.count() == 90)
    val plan = q.queryExecution.executedPlan
    def leaves(p: org.apache.spark.sql.execution.SparkPlan) =
      p.collectLeaves() ++ p.collect {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.collectLeaves()
      }.flatten
    assert(leaves(plan).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec]),
      s"MOR read must plan as native file scans, got:\n$plan")
    assert(!plan.toString.contains("GraftMorRelation"),
      "the V1 row-boundary relation must not appear on a plain MOR read")
    // the swap never captured a WRITE or DML surface (the view is
    // snapshot-pinned, so re-register it after each commit):
    def view(): Unit = spark.read.format("graft").load(dir)
      .createOrReplaceTempView("morv_t")
    view()
    spark.sql("INSERT INTO morv_t VALUES (9999)")
    assert(spark.read.format("graft").load(dir).count() == 191)
    view()
    spark.sql("DELETE FROM morv_t WHERE id = 9999")
    assert(spark.read.format("graft").load(dir).count() == 190)
    view()
    spark.sql("UPDATE morv_t SET id = id + 5000 WHERE id >= 190")
    assert(spark.read.format("graft").load(dir)
      .where("id >= 5000").count() == 10)
  }

  test("SQL path: temp view over the source answers like the library read") {
    val dir = tmpDir()
    Manifest.write((1 to 200).toDF("v"), dir, "s1")
    spark.read.format("graft").load(dir).createOrReplaceTempView("graft_sql_t")
    val viaSql = spark.sql(
      "SELECT COUNT(*) AS n, SUM(v) AS s FROM graft_sql_t WHERE v % 2 = 0")
      .as[(Long, Long)].head()
    assert(viaSql == ((100L, 10100L)))
    spark.catalog.dropTempView("graft_sql_t")
  }

  test("write face: every save mode maps to the Manifest's commit semantics") {
    val dir = tmpDir()
    (1 to 10).toDF("v").write.format("graft").mode("overwrite").save(dir)
    assert(spark.read.format("graft").load(dir).count() == 10)
    (11 to 15).toDF("v").write.format("graft").mode("append").save(dir)
    assert(spark.read.format("graft").load(dir)
      .as[Int].collect().sorted.toSeq == (1 to 15))
    // append is a real commit: time travel sees the pre-append state
    assert(spark.read.format("graft")
      .option("versionAsOf", "0").load(dir).count() == 10)
    intercept[IllegalStateException] {
      (1 to 3).toDF("v").write.format("graft").mode("errorifexists").save(dir)
    }
    (99 to 99).toDF("v").write.format("graft").mode("ignore").save(dir)
    assert(spark.read.format("graft").load(dir).count() == 15, "ignore = no-op")
    (1 to 20).toDF("v").write.format("graft").mode("overwrite").save(dir)
    assert(spark.read.format("graft").load(dir).count() == 20)
    // explicit snapshot id option (the replay-dedupe key)
    val dir2 = tmpDir()
    (1 to 5).toDF("v").write.format("graft")
      .option("snapshot", "s-batch-7").save(dir2)
    assert(graft.io.Manifest.snapshots(spark, dir2) == Seq("s-batch-7"))
  }

  test("write face: hive-partitioned land via the partitionBy option") {
    val dir = tmpDir()
    val df = spark.sql(
      """SELECT id, CASE CAST(id % 2 AS INT) WHEN 0 THEN 'en' ELSE 'fr' END AS lang
        |FROM range(0, 100)""".stripMargin)
    df.write.format("graft").option("partitionBy", "lang")
      .mode("overwrite").save(dir)
    val g = spark.read.format("graft").load(dir)
    val en = g.where("lang = 'en'")
    assert(en.count() == 50)
    assert(scannedFiles(en) < scannedFiles(g),
      "the written layout must be partition-prunable")
  }

  test("SQL INSERT INTO lands as a manifest commit, never a raw file write") {
    val dir = tmpDir()
    Manifest.write((1 to 10).toDF("v"), dir, "base")
    spark.read.format("graft").load(dir).createOrReplaceTempView("graft_ins_t")
    spark.sql("INSERT INTO graft_ins_t SELECT id FROM range(100, 105)")
    // the rows are VISIBLE through the manifest (a bypassing file write
    // would leave them invisible) and the commit is time-travelable
    assert(spark.read.format("graft").load(dir).count() == 15)
    assert(Manifest.snapshots(spark, dir).size == 2)
    assert(spark.read.format("graft")
      .option("versionAsOf", "0").load(dir).count() == 10)
    // INSERT casts by position (long range -> int column)
    assert(spark.read.format("graft").load(dir).schema("v").dataType ==
      org.apache.spark.sql.types.IntegerType)
    // INSERT OVERWRITE = a fresh snapshot, prior state retained
    spark.read.format("graft").load(dir).createOrReplaceTempView("graft_ins_t")
    spark.sql("INSERT OVERWRITE graft_ins_t SELECT id FROM range(0, 3)")
    assert(spark.read.format("graft").load(dir).count() == 3)
    assert(spark.read.format("graft")
      .option("versionAsOf", "1").load(dir).count() == 15)
    // arity mismatch fails loudly at analysis, not at commit
    intercept[Exception] {
      spark.sql("INSERT INTO graft_ins_t SELECT 1, 2")
    }
    spark.catalog.dropTempView("graft_ins_t")
    // the MOR relation takes the InsertableRelation path
    val dir3 = tmpDir()
    Manifest.write(spark.range(0, 100).toDF("id")
      .repartitionByRange(2, col("id")), dir3, "b")
    Manifest.deleteRangeMOR(spark, dir3, "id", "10", "19", "m")
    spark.read.format("graft").load(dir3).createOrReplaceTempView("graft_mor_t")
    spark.sql("INSERT INTO graft_mor_t SELECT id FROM range(1000, 1005)")
    assert(spark.read.format("graft").load(dir3).count() == 95)
    spark.catalog.dropTempView("graft_mor_t")
  }

  test("catalog DDL: CREATE TABLE USING graft, INSERT, CTAS, DROP") {
    val dir = tmpDir() + "/t"
    Manifest.write((1 to 10).toDF("v"), dir, "s0")
    // register-then-query — the reference's analyst model, now over the
    // engine's own format through the session catalog
    spark.sql(s"CREATE TABLE graft_cat_t USING graft LOCATION '$dir'")
    try {
      assert(spark.sql("SELECT COUNT(*) FROM graft_cat_t").head.getLong(0) == 10)
      // INSERT through the catalog table takes the manifest-commit path
      spark.sql("INSERT INTO graft_cat_t SELECT id FROM range(100, 105)")
      assert(Manifest.snapshots(spark, dir).size == 2)
      assert(spark.sql("SELECT COUNT(*) FROM graft_cat_t").head.getLong(0) == 15)
      // CTAS lands through the write face
      val dir2 = tmpDir() + "/t2"
      spark.sql(
        s"CREATE TABLE graft_cat_t2 USING graft LOCATION '$dir2' " +
          "AS SELECT id AS v FROM range(0, 7)")
      try {
        assert(spark.sql("SELECT COUNT(*) FROM graft_cat_t2").head.getLong(0) == 7)
        assert(Manifest.snapshots(spark, dir2).nonEmpty)
      } finally spark.sql("DROP TABLE graft_cat_t2")
    } finally spark.sql("DROP TABLE graft_cat_t")
    // dropping the catalog entry must not delete the table data
    // (EXTERNAL location semantics): the manifest still reads
    assert(Manifest.read(spark, dir).count() == 15)
  }

  test("accurate sizeInBytes lets a small graft snapshot broadcast under a join") {
    val dir = tmpDir()
    Manifest.write((1 to 50).toDF("k"), dir, "dim")
    val big = spark.range(0, 100000).selectExpr("CAST(id % 50 + 1 AS INT) AS k", "id")
    val joined = big.join(spark.read.format("graft").load(dir), "k")
    assert(joined.count() == 100000)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"a KB-sized graft table must broadcast, got:\n$plan")
  }
}
