package graft.pipeline

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.io.TableIO
import graft.meta.{ColumnMeta, DatabaseMeta, Meta, TableMeta}

/** End-to-end re-enactment of the reference pipeline (SURVEY §5.2): land
  * jsonl.gz → gates → promote → curate → catalog → SQL readback, asserting
  * the reference's observable invariants. */
class ReferencePipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.session

  import ReferencePipelineSpec.writeMeta

  test("four-stage pipeline: extract, gates+promote, curate, catalog, readback") {
    val base = Files.createTempDirectory("graft_pipeline").toString
    writeMeta(s"$base/meta")
    val ctx = PipelineContext(spark, Map(
      ReferencePipeline.LandKey -> s"$base/land",
      ReferencePipeline.RawHistKey -> s"$base/raw_hist",
      ReferencePipeline.CuratedKey -> s"$base/curated",
      ReferencePipeline.MetaDirKey -> s"$base/meta",
      ReferencePipeline.TableKey -> "random_postcodes",
      ReferencePipeline.LandTsKey -> "1700000000",
      ReferencePipeline.SnapshotDateKey -> "2026-08-12",
      ReferencePipeline.RowsKey -> "200"),
      version = "vTEST")

    val result = ReferencePipeline.standard.run(ctx)
    assert(result.succeeded, result.reports.flatMap(_.error).map(_.toString).mkString("; "))

    // land is transient: emptied after promotion (README.md:23-26)
    assert(TableIO.listDataFiles(spark, s"$base/land/random_postcodes").isEmpty)
    // raw-hist holds the promoted partition (immutable history)
    val rawFiles = TableIO.listDataFiles(spark,
      s"$base/raw_hist/random_postcodes/file_land_timestamp=1700000000")
    assert(rawFiles.nonEmpty && rawFiles.forall(_.endsWith(".gz")))

    // curated table rebuilt with version stamp on every row
    val curated = spark.read.parquet(s"$base/curated/database/random_postcodes")
    assert(curated.count() == 200)
    import org.apache.spark.sql.functions.col
    assert(curated.filter(col("dea_version") =!= "vTEST").count() == 0)

    // catalog: calculated only readable with partitions after MSCK (which
    // DeployCatalogStage ran) — counts must reconcile with raw rows
    val calc = spark.sql("SELECT SUM(n) AS total FROM example_postcodes_db.calculated")
      .collect().head.getLong(0)
    assert(calc == 200)
    val regions = spark.sql(
      """SELECT european_electoral_region FROM example_postcodes_db.calculated
        |WHERE european_electoral_region <> lower(european_electoral_region)""".stripMargin)
    assert(regions.count() == 0) // LOWER() normalization applied (job.py:53)
  }

  test("second run accumulates raw-hist history; curated rebuild spans ALL batches (O11)") {
    val base = Files.createTempDirectory("graft_pipeline_hist").toString
    writeMeta(s"$base/meta")
    def ctxFor(ts: String, rows: String) = PipelineContext(spark, Map(
      ReferencePipeline.LandKey -> s"$base/land",
      ReferencePipeline.RawHistKey -> s"$base/raw_hist",
      ReferencePipeline.CuratedKey -> s"$base/curated",
      ReferencePipeline.MetaDirKey -> s"$base/meta",
      ReferencePipeline.TableKey -> "random_postcodes",
      ReferencePipeline.LandTsKey -> ts,
      ReferencePipeline.SnapshotDateKey -> "2026-08-12",
      ReferencePipeline.RowsKey -> rows),
      version = "vHIST")

    assert(ReferencePipeline.standard.run(ctxFor("1700000000", "150")).succeeded)
    assert(ReferencePipeline.standard.run(ctxFor("1700000100", "120")).succeeded)

    // raw-hist keeps BOTH immutable batches
    assert(TableIO.listDataFiles(spark,
      s"$base/raw_hist/random_postcodes/file_land_timestamp=1700000000").nonEmpty)
    assert(TableIO.listDataFiles(spark,
      s"$base/raw_hist/random_postcodes/file_land_timestamp=1700000100").nonEmpty)
    // curated is a full rebuild over the implicit union of all history
    assert(spark.read.parquet(s"$base/curated/database/random_postcodes").count() == 270)
    val total = spark.sql("SELECT SUM(n) FROM example_postcodes_db.calculated")
      .collect().head.getLong(0)
    assert(total == 270) // counts reconcile with sum of raw-hist (README.md:438)
  }

  test("gate failure stops the pipeline before promotion (fail-fast DAG)") {
    val base = Files.createTempDirectory("graft_pipeline_fail").toString
    writeMeta(s"$base/meta")
    val ctx = PipelineContext(spark, Map(
      ReferencePipeline.LandKey -> s"$base/land",
      ReferencePipeline.RawHistKey -> s"$base/raw_hist",
      ReferencePipeline.CuratedKey -> s"$base/curated",
      ReferencePipeline.MetaDirKey -> s"$base/meta",
      ReferencePipeline.TableKey -> "random_postcodes",
      ReferencePipeline.LandTsKey -> "1700000001",
      ReferencePipeline.SnapshotDateKey -> "2026-08-12",
      ReferencePipeline.RowsKey -> "50")) // < 100 → row-count gate fails

    val result = ReferencePipeline.standard.run(ctx)
    assert(!result.succeeded)
    assert(result.reports.map(_.stage) == Seq("extract", "test-extract")) // later stages never ran
    // nothing promoted — land data intact, raw-hist absent
    assert(TableIO.listDataFiles(spark, s"$base/land/random_postcodes").nonEmpty)
    assert(TableIO.listDataFiles(spark, s"$base/raw_hist/random_postcodes").isEmpty)
  }
}

object ReferencePipelineSpec {
  /** Shared fixture: the reference meta_data/ folder shape. */
  def writeMeta(dir: String): Unit = {
    val rawCols = Seq(
      "postcode", "country", "european_electoral_region", "region",
      "admin_district", "codes_admin_district").map(ColumnMeta(_, "character")) ++
      Seq("quality", "eastings", "northings", "index").map(ColumnMeta(_, "int")) ++
      Seq("longitude", "latitude").map(ColumnMeta(_, "double"))
    val curatedCols = rawCols :+ ColumnMeta("dea_version", "character")
    val calcCols = Seq(
      ColumnMeta("european_electoral_region", "character"),
      ColumnMeta("n", "int"),
      ColumnMeta("dea_version", "character"),
      ColumnMeta("dea_snapshot_date", "date"))
    Files.createDirectories(Paths.get(s"$dir/raw"))
    Files.createDirectories(Paths.get(s"$dir/curated"))
    Files.writeString(Paths.get(s"$dir/raw/random_postcodes.json"),
      Meta.renderTable(TableMeta("random_postcodes", "json", rawCols)))
    Files.writeString(Paths.get(s"$dir/curated/random_postcodes.json"),
      Meta.renderTable(TableMeta("random_postcodes", "parquet", curatedCols)))
    Files.writeString(Paths.get(s"$dir/curated/calculated.json"),
      Meta.renderTable(TableMeta("calculated", "parquet", calcCols,
        partitions = Seq("dea_snapshot_date"))))
    Files.writeString(Paths.get(s"$dir/curated/database.json"),
      """{"name": "example_postcodes_db", "bucket": "IGNORED", "base_folder": "database"}""")
  }
}
