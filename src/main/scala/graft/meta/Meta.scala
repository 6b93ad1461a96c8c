package graft.meta

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import scala.util.matching.Regex

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.types._

/**
 * Metadata-driven schema system: JSON table schemas with engine-agnostic
 * types, mirroring the reference's etl_manager metadata contract
 * (reference: meta_data/raw/random_postcodes.json, meta_data/curated/
 * calculated.json:1-30, meta_data/curated/database.json:1-6; SURVEY.md
 * §1.3-1.4). Schemas are runtime data, decoupled from the files they
 * describe ("schema-on-read", reference README.md:123).
 */
/** One declared column. `nullable`/`enumValues`/`pattern` carry the
  * etl_manager schema's VALUE constraints (reference README.md:271
  * names datatypes, enums, regex and nullables as the full metadata
  * test surface; the table_schema spec's `nullable`/`enum`/`pattern`
  * keys) — enforced by [[graft.validate.Gates.valueGates]]. */
final case class ColumnMeta(name: String, typ: String, description: String = "",
    nullable: Boolean = true, enumValues: Seq[String] = Nil,
    pattern: Option[String] = None) {
  def sparkType: DataType = MetaTypes.toSpark(typ)
  def toField: StructField = StructField(name, sparkType, nullable = true)
}

final case class TableMeta(
    name: String,
    dataFormat: String,
    columns: Seq[ColumnMeta],
    partitions: Seq[String] = Nil,
    location: String = "",
    description: String = "") {
  /** Full declared schema including partition columns. */
  def schema: StructType = StructType(columns.map(_.toField))
  /** Columns physically stored in data files (partition cols live in paths —
    * reference job.py:67 drops them before the write). */
  def dataColumns: Seq[ColumnMeta] = columns.filterNot(c => partitions.contains(c.name))
  def columnNames: Seq[String] = columns.map(_.name)
  def tableLocation: String = if (location.nonEmpty) location else name
}

/** Database = named set of curated tables under one base path
  * (reference meta_data/curated/database.json; README.md:121). */
final case class DatabaseMeta(name: String, bucket: String, baseFolder: String, description: String = "") {
  def basePath: String = s"${bucket.stripSuffix("/")}/${baseFolder.stripSuffix("/")}"
  def tablePath(t: TableMeta): String = s"$basePath/${t.tableLocation.stripSuffix("/")}"
}

object MetaTypes {
  private val DecimalRe: Regex = """decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r

  /** Agnostic metadata type → Spark SQL type (SURVEY.md §1.3 mapping). */
  def toSpark(t: String): DataType = t.trim.toLowerCase match {
    case "character" | "string" | "text"  => StringType
    case "int" | "integer"                => IntegerType
    case "long" | "bigint"                => LongType
    case "double" | "float8" | "numeric"  => DoubleType
    case "float"                          => FloatType
    case "boolean" | "bool"               => BooleanType
    case "date"                           => DateType
    case "datetime" | "timestamp"         => TimestampType
    case "binary"                         => BinaryType
    case DecimalRe(p, s)                  => DecimalType(p.toInt, s.toInt)
    case other => throw new IllegalArgumentException(s"unknown metadata type: $other")
  }

  /** Spark type → agnostic metadata type (for writing schemas back out). */
  def fromSpark(dt: DataType): String = dt match {
    case StringType        => "character"
    case IntegerType       => "int"
    case LongType          => "long"
    case DoubleType        => "double"
    case FloatType         => "float"
    case BooleanType       => "boolean"
    case DateType          => "date"
    case TimestampType     => "datetime"
    case BinaryType        => "binary"
    case d: DecimalType    => s"decimal(${d.precision},${d.scale})"
    case other => throw new IllegalArgumentException(s"unmapped spark type: $other")
  }
}

object Meta {
  private val mapper = new ObjectMapper()

  private def textOf(n: JsonNode, field: String, default: String = ""): String = {
    val v = n.get(field)
    if (v == null || v.isNull) default else v.asText()
  }

  def parseTable(json: String): TableMeta = {
    val root = mapper.readTree(json)
    val cols = Option(root.get("columns")).map(_.elements().asScala.toSeq).getOrElse(Nil).map { c =>
      val enumVals = Option(c.get("enum")).filterNot(_.isNull)
        .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil)
      val nullable = Option(c.get("nullable")).filterNot(_.isNull)
        .forall(_.asBoolean(true))
      val pattern = Option(c.get("pattern")).filterNot(_.isNull)
        .map(_.asText()).filter(_.nonEmpty)
      ColumnMeta(textOf(c, "name"), textOf(c, "type"), textOf(c, "description"),
        nullable = nullable, enumValues = enumVals, pattern = pattern)
    }
    val parts = Option(root.get("partitions")).map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil)
    TableMeta(
      name = textOf(root, "name"),
      dataFormat = textOf(root, "data_format", "parquet"),
      columns = cols,
      partitions = parts,
      location = textOf(root, "location"),
      description = textOf(root, "description"))
  }

  def parseDatabase(json: String): DatabaseMeta = {
    val root = mapper.readTree(json)
    DatabaseMeta(
      name = textOf(root, "name"),
      bucket = textOf(root, "bucket"),
      baseFolder = textOf(root, "base_folder"),
      description = textOf(root, "description"))
  }

  def loadTable(path: String): TableMeta = parseTable(Files.readString(Paths.get(path)))
  def loadDatabase(path: String): DatabaseMeta = parseDatabase(Files.readString(Paths.get(path)))

  /** Read a metadata folder: database.json + one JSON per table
    * (reference create_database_schema.py:4 read_database_folder). */
  def loadDatabaseFolder(dir: String): (DatabaseMeta, Seq[TableMeta]) = {
    val p = Paths.get(dir)
    val files = Files.list(p).iterator().asScala.toSeq
      .filter(_.toString.endsWith(".json")).sortBy(_.toString)
    val (dbFiles, tableFiles) = files.partition(_.getFileName.toString == "database.json")
    val db = dbFiles.headOption
      .map(f => loadDatabase(f.toString))
      .getOrElse(throw new IllegalArgumentException(s"no database.json in $dir"))
    (db, tableFiles.map(f => loadTable(f.toString)))
  }

  def renderTable(t: TableMeta): String = {
    val cols = t.columns.map { c =>
      val extras =
        (if (c.nullable) Nil
         else Seq(""""nullable": false""")) ++
        (if (c.enumValues.isEmpty) Nil
         else Seq(s""""enum": ${c.enumValues.map(q).mkString("[", ", ", "]")}""")) ++
        c.pattern.map(p => s""""pattern": ${q(p)}""").toSeq
      val tail = if (extras.isEmpty) "" else extras.mkString(", ", ", ", "")
      s"""    {"name": ${q(c.name)}, "type": ${q(c.typ)}, """ +
        s""""description": ${q(c.description)}$tail}"""
    }.mkString(",\n")
    val parts = t.partitions.map(q).mkString("[", ", ", "]")
    s"""{
       |  "name": ${q(t.name)},
       |  "description": ${q(t.description)},
       |  "data_format": ${q(t.dataFormat)},
       |  "location": ${q(t.tableLocation)},
       |  "columns": [
       |$cols
       |  ],
       |  "partitions": $parts
       |}""".stripMargin
  }

  private def q(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
