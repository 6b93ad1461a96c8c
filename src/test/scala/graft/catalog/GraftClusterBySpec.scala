package graft.catalog

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.io.Manifest

/**
 * Declared clustering (round 13, the liquid-clustering shape):
 * `CREATE TABLE … CLUSTER BY (c)` / `ALTER TABLE … CLUSTER BY` record
 * the clustering columns on the table, and `CALL system.zorder` with
 * no explicit columns applies them — declare once, every maintenance
 * pass clusters. Writes land as-is (clustering is the maintenance
 * pass's job, exactly like OPTIMIZE on clustered Delta tables).
 */
class GraftClusterBySpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestBase.session
    val wh = java.nio.file.Files.createTempDirectory("graftwh_clu").toString
    s.conf.set("spark.sql.catalog.gclu", "graft.catalog.GraftCatalog")
    s.conf.set("spark.sql.catalog.gclu.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gclu.db")
    s.conf.set("graft.test.cluwh", wh)
    s
  }
  private def wh = spark.conf.get("graft.test.cluwh")
  private def sql(q: String) = spark.sql(q)

  /** Per-file [min,max] of `col` — tight, disjoint ranges mean the
    * clustering actually happened. */
  private def ranges(dir: String, col0: String): Seq[(Long, Long)] =
    Manifest.currentFiles(spark, dir).map { f =>
      val r = spark.read.parquet(s"$dir/$f")
        .agg(min(col0), max(col0)).head
      (r.getLong(0), r.getLong(1))
    }

  test("CLUSTER BY declares; CALL zorder with no columns applies it") {
    sql("""CREATE TABLE gclu.db.c (id BIGINT, v BIGINT) USING graft
          |CLUSTER BY (v)""".stripMargin)
    // land data ANTI-clustered on v (round-robin across inserts)
    sql("""INSERT INTO gclu.db.c
          |SELECT id, (id * 37) % 1000 FROM range(0, 3000)""".stripMargin)
    val dir = s"$wh/db/c"
    // the declaration is visible on the table's partitioning face
    val t = spark.sessionState.catalogManager.catalog("gclu")
      .asInstanceOf[GraftCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("db"), "c"))
    assert(t.partitioning().exists {
      case org.apache.spark.sql.connector.expressions
          .ClusterByTransform(refs) =>
        refs.map(_.fieldNames.mkString(".")) == Seq("v")
      case _ => false
    }, t.partitioning().mkString(", "))
    // zorder with NO columns: the declared clustering drives the pass
    sql("CALL gclu.system.zorder(table => 'db.c', " +
      "target_file_bytes => 8192)")
    val rs = ranges(dir, "v")
    assert(rs.size >= 3, s"expected a multi-file clustered layout, got $rs")
    // clustered = per-file v-ranges are (near-)disjoint: total overlap
    // across sorted ranges stays tiny vs the value space
    val sorted = rs.sortBy(_._1)
    val overlaps = sorted.sliding(2).collect {
      case Seq((_, hi1), (lo2, _)) if lo2 <= hi1 => hi1 - lo2 + 1
    }.sum
    assert(overlaps <= 50, s"ranges barely overlap after clustering: $sorted")
    assert(sql("SELECT COUNT(*) FROM gclu.db.c").head.getLong(0) == 3000)
    // ALTER re-declares; the next no-column pass clusters on the new key
    sql("ALTER TABLE gclu.db.c CLUSTER BY (id)")
    sql("CALL gclu.system.zorder(table => 'db.c', " +
      "target_file_bytes => 8192)")
    val byId = ranges(dir, "id").sortBy(_._1)
    val idOverlaps = byId.sliding(2).collect {
      case Seq((_, hi1), (lo2, _)) if lo2 <= hi1 => hi1 - lo2 + 1
    }.sum
    assert(idOverlaps <= 50, s"recluster on id: $byId")
    // CLUSTER BY NONE clears it - a bare zorder call then refuses
    sql("ALTER TABLE gclu.db.c CLUSTER BY NONE")
    val e = intercept[Exception](
      sql("CALL gclu.system.zorder(table => 'db.c')"))
    def msgs(t: Throwable): String = {
      var m = List.empty[String]; var c: Throwable = t
      while (c != null) { m ::= String.valueOf(c.getMessage); c = c.getCause }
      m.mkString(" | ")
    }
    assert(msgs(e).contains("CLUSTER BY"), msgs(e))
    // explicit columns still work without a declaration
    sql("CALL gclu.system.zorder(table => 'db.c', columns => 'v')")
  }

  test("cluster columns must exist and must not be partition columns") {
    intercept[Exception](sql(
      "CREATE TABLE gclu.db.bad (id BIGINT) USING graft CLUSTER BY (nope)"))
    sql("""CREATE TABLE gclu.db.p (id BIGINT, k INT) USING graft
          |PARTITIONED BY (k)""".stripMargin)
    sql("INSERT INTO gclu.db.p SELECT id, CAST(id % 3 AS INT) FROM range(0, 30)")
    val e = intercept[Exception](sql("ALTER TABLE gclu.db.p CLUSTER BY (k)"))
    assert(String.valueOf(e.getMessage).contains("partition") ||
      Option(e.getCause).exists(c =>
        String.valueOf(c.getMessage).contains("partition")))
  }
}
