package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.align.Align
import graft.catalog.Catalog
import graft.io.TableIO
import graft.meta.{DatabaseMeta, Meta, TableMeta}
import graft.validate.Gates

/**
 * Full re-enactment of the reference's four-stage ETL pipeline on this
 * engine (SURVEY.md §3.1): extract → validate/promote → curate → deploy
 * catalog. The extract is a deterministic fixture generator shaped like the
 * postcodes.io records (reference README.md:150-189, flattened with codes_
 * prefixes per custom_functions.py:10-18) — there is no network here; at
 * scale the extract is whatever lands files in the land zone.
 */
object ReferencePipeline {

  // conf keys
  val LandKey = "zones.land"
  val RawHistKey = "zones.rawHist"
  val CuratedKey = "zones.curated"
  val MetaDirKey = "meta.dir"
  val TableKey = "table"
  val LandTsKey = "landTimestamp"
  val SnapshotDateKey = "snapshotDate"
  val RowsKey = "extract.rows"
  val MinRowsKey = "gate.minRows"

  private val regions = Seq(
    "South West", "London", "North East", "North West", "Eastern",
    "East Midlands", "West Midlands", "Yorkshire and The Humber", "South East", "Wales")

  /** Deterministic API-shaped responses (seeded, no network): the nested
    * postcodes.io record shape `{status, result: {..., codes: {...}}}`
    * (reference README.md:150-189). */
  def syntheticApiResponses(n: Int): Seq[String] = {
    (0 until n).map { i =>
      val r = regions(i % regions.size)
      // mix case to exercise the LOWER() normalization (reference job.py:53)
      val region = if (i % 3 == 0) r.toUpperCase else r
      val admin = if (i % 7 == 0) "null" else s""""District ${i % 20}""""
      s"""{"status": 200, "result": {"postcode": "AB$i ${i % 10}CD",
         | "quality": ${1 + i % 3}, "eastings": ${400000 + i},
         | "northings": ${150000 + i}, "country": "England",
         | "european_electoral_region": "$region", "region": "$r",
         | "longitude": ${-1.8 + (i % 100) / 1000.0}, "latitude": ${51.2 + (i % 100) / 1000.0},
         | "admin_district": $admin,
         | "codes": {"admin_district": "E0${6000000 + i}"}}}""".stripMargin.replaceAll("\n", "")
    }
  }

  /** F0 extract: API-shaped records → flatten one level with `codes_`
    * prefixes (O2) → contiguous index (O3) → single jsonl.gz under the
    * land partition path (reference write_data_to_land.py:31-42; O1-O5). */
  final case class ExtractStage() extends Stage {
    val name = "extract"
    def run(ctx: PipelineContext): Unit = {
      val spark = ctx.spark
      import spark.implicits._
      val n = ctx.conf.getOrElse(RowsKey, "1000").toInt
      val ts = ctx(LandTsKey).toLong
      val landPath = TableIO.landPartitionPath(ctx(LandKey), ctx(TableKey), ts)
      val raw = spark.read.json(spark.createDataset(syntheticApiResponses(n)))
      val flat = graft.ops.Reshape.flattenOneLevel(raw, "result").drop("status")
      val indexed = graft.ops.Reshape.withRowIndex(flat, "index")
      ctx.log(s"extract: $n rows -> $landPath")
      TableIO.writeJsonlGz(indexed, landPath, singleFile = true)
    }
  }

  /** F1 validate: row-count + column-set gates, then byte-identical
    * promotion land → raw-hist and land cleanup (reference test_data.py;
    * O8-O10). */
  final case class ValidateStage() extends Stage {
    val name = "test-extract"
    def run(ctx: PipelineContext): Unit = {
      val spark = ctx.spark
      val table = ctx(TableKey)
      val ts = ctx(LandTsKey).toLong
      val landPath = TableIO.landPartitionPath(ctx(LandKey), table, ts)
      val meta = Meta.loadTable(s"${ctx(MetaDirKey)}/raw/$table.json")
      val df = TableIO.readJson(spark, landPath)
      val minRows = ctx.conf.getOrElse(MinRowsKey, "100").toLong
      Gates.enforce(
        Gates.rowCountGate(df, minRows),
        Gates.columnSetGate(df.columns.toSeq, meta, ignore = Set(TableIO.LandTimestampCol)))
      val rawHistPath = TableIO.landPartitionPath(ctx(RawHistKey), table, ts)
      ctx.log(s"validate: gates passed; promoting $landPath -> $rawHistPath")
      TableIO.promote(spark, landPath, rawHistPath)
    }
  }

  /** F2 curate: the reference Spark job verbatim in engine terms (reference
    * glue_jobs/example_job/job.py:39-73) — read ALL raw-hist history
    * (implicit union of partitions), version-stamp every row, GROUP BY
    * LOWER(region) count, align both frames to curated metadata, write
    * table overwrite + explicit-partition snapshot. */
  final case class CurateStage() extends Stage {
    val name = "run-curated"
    def run(ctx: PipelineContext): Unit = {
      val spark = ctx.spark
      val table = ctx(TableKey)
      val metaDir = ctx(MetaDirKey)
      val db = Meta.loadDatabase(s"$metaDir/curated/database.json")
      val tableMeta = Meta.loadTable(s"$metaDir/curated/$table.json")
      val calcMeta = Meta.loadTable(s"$metaDir/curated/calculated.json")

      val all = TableIO.readJson(spark, s"${ctx(RawHistKey)}/$table") // job.py:39
      all.createOrReplaceTempView("postcodes")
      val stamped = spark.sql(
        s"SELECT *, '${ctx.version}' AS dea_version FROM postcodes") // job.py:42-45
      stamped.createOrReplaceTempView("postcodes_stamped")
      val calculated = spark.sql(
        """SELECT LOWER(european_electoral_region) AS european_electoral_region,
          |       COUNT(*) AS n
          |FROM postcodes GROUP BY LOWER(european_electoral_region)""".stripMargin) // job.py:52-56
        .withColumn("dea_version", lit(ctx.version)) // job.py:58-59

      val curatedBase = ctx(CuratedKey)
      TableIO.writeParquetOverwrite(
        Align.alignToMeta(stamped, tableMeta), s"$curatedBase/${db.baseFolder}/${tableMeta.tableLocation}")
      TableIO.writeIntoPartition(
        Align.alignToMeta(calculated, calcMeta, dropColumns = calcMeta.partitions),
        s"$curatedBase/${db.baseFolder}/${calcMeta.tableLocation}",
        partitionCol = calcMeta.partitions.head,
        partitionValue = ctx(SnapshotDateKey),
        format = calcMeta.dataFormat)
    }
  }

  /** F3 deploy: drop/create database + tables from metadata, repair
    * partitions (reference create_database_schema.py:4-8). */
  final case class DeployCatalogStage() extends Stage {
    val name = "deploy-database"
    def run(ctx: PipelineContext): Unit = {
      val spark = ctx.spark
      val (db0, tables) = Meta.loadDatabaseFolder(s"${ctx(MetaDirKey)}/curated")
      val db = db0.copy(bucket = ctx(CuratedKey)) // rebase onto this run's curated zone
      Catalog.deployDatabase(spark, db, tables)
      Catalog.repairAllTablePartitions(spark, db, tables)
    }
  }

  def standard: Pipeline =
    new Pipeline(Seq(ExtractStage(), ValidateStage(), CurateStage(), DeployCatalogStage()))
}
