package graft.catalog

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.io.Manifest

/**
 * ENFORCED CHECK constraints (round 13): declared through standard SQL
 * (`CREATE TABLE … CONSTRAINT … CHECK (…)` / `ALTER TABLE … ADD
 * CONSTRAINT`), validated against existing rows on ADD, and enforced
 * at the ONE write choke point every path funnels through — INSERT,
 * CTAS, COW and MOR DML, streaming epochs. A violating batch lands
 * nothing durable; the error names every violated constraint with its
 * count. SQL semantics: TRUE and UNKNOWN pass, FALSE violates.
 */
class GraftConstraintsSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestBase.session
    val wh = java.nio.file.Files.createTempDirectory("graftwh_con").toString
    s.conf.set("spark.sql.catalog.gcon", "graft.catalog.GraftCatalog")
    s.conf.set("spark.sql.catalog.gcon.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gcon.db")
    s.conf.set("graft.test.conwh", wh)
    s
  }
  private def wh = spark.conf.get("graft.test.conwh")
  private def sql(q: String) = spark.sql(q)

  private def msg(t: Throwable): String = {
    var m = List.empty[String]
    var c: Throwable = t
    while (c != null) { m ::= String.valueOf(c.getMessage); c = c.getCause }
    m.mkString(" | ")
  }

  test("ALTER ADD CONSTRAINT validates existing rows; writes enforce it") {
    sql("CREATE TABLE gcon.db.t (id BIGINT, v BIGINT) USING graft")
    sql("INSERT INTO gcon.db.t VALUES (1, 10), (2, 20)")
    sql("ALTER TABLE gcon.db.t ADD CONSTRAINT v_pos CHECK (v > 0)")
    // valid insert passes; NULL passes (UNKNOWN is not a violation)
    sql("INSERT INTO gcon.db.t VALUES (3, 30), (4, NULL)")
    assert(sql("SELECT COUNT(*) FROM gcon.db.t").head.getLong(0) == 4)
    // violating insert fails naming the constraint; nothing committed.
    // (With constraints() declared, Spark's own row-level write check
    // fires first on SQL writes — the choke-point gate below remains
    // the net for library-level writers.)
    val dir = s"$wh/db/t"
    val snapsBefore = Manifest.snapshots(spark, dir)
    val e = intercept[Exception](
      sql("INSERT INTO gcon.db.t VALUES (5, -1), (6, -2), (7, 70)"))
    assert(msg(e).contains("v_pos"), msg(e))
    assert(Manifest.snapshots(spark, dir) == snapsBefore,
      "a violating batch must not commit")
    assert(sql("SELECT COUNT(*) FROM gcon.db.t").head.getLong(0) == 4)
    // the LIBRARY write path (no Spark SQL in the loop) is gated by
    // the manifest choke point, counting every violation
    import spark.implicits._
    val e1b = intercept[IllegalStateException](
      Manifest.append(Seq((9L, -9L), (10L, -10L)).toDF("id", "v"),
        dir, "lib-bad"))
    assert(e1b.getMessage.contains("v_pos") &&
      e1b.getMessage.contains("2 row(s)"), e1b.getMessage)
    assert(Manifest.snapshots(spark, dir) == snapsBefore)
    // adding a constraint existing rows violate refuses with the scan
    // (Spark's validation query through the V1Scan shim fires first on
    // SQL; alterTable's own scan guards direct API callers)
    val e2 = intercept[Exception](
      sql("ALTER TABLE gcon.db.t ADD CONSTRAINT v_small CHECK (v < 15)"))
    assert(msg(e2).contains("existing rows violate") ||
      msg(e2).contains("violated by existing data"), msg(e2))
    // dropping re-opens the door
    sql("ALTER TABLE gcon.db.t DROP CONSTRAINT v_pos")
    sql("INSERT INTO gcon.db.t VALUES (8, -8)")
    assert(sql("SELECT COUNT(*) FROM gcon.db.t").head.getLong(0) == 5)
    // unknown-name drop refuses; IF EXISTS is quiet
    intercept[Exception](sql("ALTER TABLE gcon.db.t DROP CONSTRAINT nope"))
    sql("ALTER TABLE gcon.db.t DROP CONSTRAINT IF EXISTS nope")
  }

  test("CREATE-time CHECK constraints gate the first write (CTAS included)") {
    sql("""CREATE TABLE gcon.db.c (id BIGINT, v BIGINT,
          |  CONSTRAINT v_pos CHECK (v > 0)) USING graft""".stripMargin)
    val e = intercept[Exception](
      sql("INSERT INTO gcon.db.c VALUES (1, 0)"))
    assert(msg(e).contains("v_pos"), msg(e))
    sql("INSERT INTO gcon.db.c VALUES (1, 1)")
    assert(sql("SELECT COUNT(*) FROM gcon.db.c").head.getLong(0) == 1)
  }

  test("DML cannot be the door: COW and MOR updates enforce constraints") {
    sql("""CREATE TABLE gcon.db.u (id BIGINT, v BIGINT,
          |  CONSTRAINT v_pos CHECK (v > 0)) USING graft""".stripMargin)
    sql("INSERT INTO gcon.db.u SELECT id, id + 1 FROM range(0, 100)")
    val e = intercept[Exception](
      sql("UPDATE gcon.db.u SET v = -v WHERE id < 5"))
    assert(msg(e).contains("v_pos"), msg(e))
    assert(sql("SELECT COUNT(*) FROM gcon.db.u WHERE v <= 0")
      .head.getLong(0) == 0)
    // MERGE inserting a violating row fails too
    spark.range(1).selectExpr("200 AS k", "-5 AS nv")
      .createOrReplaceTempView("gcon_msrc")
    val e2 = intercept[Exception](sql(
      """MERGE INTO gcon.db.u t USING gcon_msrc s ON t.id = s.k
        |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.k, s.nv)
        |""".stripMargin))
    assert(msg(e2).contains("v_pos"), msg(e2))
    // MOR-mode table: the updated-copies write is gated the same way,
    // and a failed MOR update leaves NO delete state behind
    sql("""CREATE TABLE gcon.db.m (id BIGINT, v BIGINT,
          |  CONSTRAINT v_pos CHECK (v > 0)) USING graft
          |TBLPROPERTIES ('graft.dml.mode' = 'mor')""".stripMargin)
    sql("INSERT INTO gcon.db.m SELECT id, id + 1 FROM range(0, 50)")
    val mdir = s"$wh/db/m"
    val delsBefore = Manifest.history(spark, mdir).last.deleteFiles
    val e3 = intercept[Exception](
      sql("UPDATE gcon.db.m SET v = 0 WHERE id < 3"))
    assert(msg(e3).contains("v_pos"), msg(e3))
    assert(Manifest.history(spark, mdir).last.deleteFiles == delsBefore)
    assert(sql("SELECT COUNT(*) FROM gcon.db.m WHERE v <= 0")
      .head.getLong(0) == 0)
    sql("UPDATE gcon.db.m SET v = v + 100 WHERE id < 3") // valid passes
    assert(sql("SELECT COUNT(*) FROM gcon.db.m WHERE v > 100")
      .head.getLong(0) == 3)
  }

  test("streaming epochs are gated; constraint state is not raw TBLPROPERTIES") {
    sql("""CREATE TABLE gcon.db.s (id BIGINT, v BIGINT,
          |  CONSTRAINT v_pos CHECK (v > 0)) USING graft""".stripMargin)
    sql("CREATE TABLE gcon.db.src USING graft AS SELECT id, id - 5 AS v FROM range(0, 10)")
    val ckpt = java.nio.file.Files.createTempDirectory("gcon-ckpt").toString
    val e = intercept[Exception] {
      spark.readStream.table("gcon.db.src")
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .toTable("gcon.db.s").awaitTermination()
    }
    assert(msg(e).contains("v_pos"), msg(e))
    assert(sql("SELECT COUNT(*) FROM gcon.db.s").head.getLong(0) == 0,
      "a violating epoch must not half-enter the table")
    // the reserved property prefix refuses direct SET
    val e2 = intercept[Exception](sql(
      "ALTER TABLE gcon.db.s SET TBLPROPERTIES " +
        "('graft.constraint.sneak' = '1 = 1')"))
    assert(msg(e2).contains("ADD CONSTRAINT"), msg(e2))
  }
}
