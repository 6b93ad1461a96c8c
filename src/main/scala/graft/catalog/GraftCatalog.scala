package graft.catalog

import java.util.Locale

import scala.collection.JavaConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, SupportsWrite, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.{BaseRelation, InsertableRelation}
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.io.Manifest

/**
 * A V2 `TableCatalog` over graft (Manifest) tables — the
 * deploy-then-query model the reference ships (its schema stage
 * registers every table in a catalog and analysts only ever touch the
 * NAMES, reference create_database_schema.py:4-8, README.md:424-436),
 * at engine-native fidelity:
 *
 * {{{
 *   spark.sql.catalog.graft           = graft.catalog.GraftCatalog
 *   spark.sql.catalog.graft.warehouse = s3://bucket/warehouse
 *
 *   CREATE NAMESPACE graft.db;
 *   CREATE TABLE graft.db.t USING graft PARTITIONED BY (k) AS SELECT …;
 *   INSERT INTO graft.db.t SELECT …;
 *   DELETE FROM graft.db.t WHERE …;
 *   SELECT * FROM graft.db.t VERSION AS OF 1;   -- commit_seq
 *   SELECT * FROM graft.db.t TIMESTAMP AS OF '2026-01-01 00:00:00';
 * }}}
 *
 * Layout: a table named `db.t` lives at `<warehouse>/db/t` — a plain
 * Manifest table dir (the catalog adds NOTHING to the data path; any
 * catalog table is also readable by path and vice versa). A
 * `.graft-table.json` sidecar written by DDL carries what a manifest
 * cannot: the declared schema of a still-empty table (a manifest
 * snapshot must list at least one file, so CREATE-then-INSERT needs
 * the schema parked somewhere), the declared partition columns, a
 * `location` redirect for `CREATE TABLE … LOCATION` over an existing
 * path table, and table properties. Identifiers are restricted to
 * `[A-Za-z0-9_.-]` so a name can never escape the warehouse root.
 *
 * Execution stays on the V1 fast path: reads resolve through
 * [[GraftCatalogReadRule]], which swaps the `DataSourceV2Relation`
 * for the SAME snapshot-pinned `HadoopFsRelation` the path-based
 * `spark.read.format("graft")` face builds (vectorized parquet,
 * manifest partition pruning, footer-bounds skipping, accurate
 * `sizeInBytes` broadcasts) — and, downstream of that swap, SQL
 * INSERT/DELETE/UPDATE/MERGE hit the existing interception rules, so
 * the catalog gets the full DML surface for free. Writes go through
 * the V2 `V1Write` fallback onto the same Manifest commits (append
 * rebases on lost CAS races; INSERT OVERWRITE = a truncate write = a
 * fresh snapshot, time travel keeps the history). Time travel
 * (`VERSION AS OF` = commit_seq or snapshot id, `TIMESTAMP AS OF`)
 * resolves through the catalog's `loadTable` overloads onto the same
 * selectors the path face exposes as options.
 *
 * At 100 TB nothing here is data-proportional: every catalog
 * operation is a LIST/read of KB-sized metadata keys; the listing
 * cost Spark pays to resolve a name is one directory LIST — the
 * manifest protocol's own resolution cost.
 */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  private def spark: SparkSession = SparkSession.active
  private def fsys: FileSystem =
    new Path(warehouse).getFileSystem(spark.sparkContext.hadoopConfiguration)

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"graft catalog '$name': set spark.sql.catalog.$name.warehouse"))
  }

  override def name(): String = catalogName

  // ---- path mapping ------------------------------------------------------

  private def validPart(s: String): String = {
    require(s.matches("[A-Za-z0-9_][A-Za-z0-9_.-]*"),
      s"graft catalog: unsafe identifier part '$s' " +
        "(allowed: [A-Za-z0-9_][A-Za-z0-9_.-]*)")
    s
  }

  private def nsPath(ns: Array[String]): Path =
    ns.map(validPart).foldLeft(new Path(warehouse))(new Path(_, _))

  private def identPath(ident: Identifier): Path =
    new Path(nsPath(ident.namespace), validPart(ident.name))

  /** A dir is a TABLE when DDL left a sidecar or a writer committed a
    * manifest; it is a NAMESPACE when it exists and is neither. */
  private def isTable(p: Path): Boolean =
    fsys.exists(new Path(p, GraftTableMeta.SidecarName)) ||
      (fsys.exists(p) && fsys.listStatus(p).exists { st =>
        val n = st.getPath.getName
        n.startsWith("manifest-") && n.endsWith(".json")
      })

  // ---- tables ------------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val p = nsPath(namespace)
    if (!fsys.exists(p) || isTable(p))
      throw new NoSuchNamespaceException(namespace)
    fsys.listStatus(p).toSeq.filter(_.isDirectory)
      .map(_.getPath).filter(isTable)
      .map(tp => Identifier.of(namespace, tp.getName))
      .sortBy(_.name).toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    scala.util.Try(isTable(identPath(ident))).getOrElse(false)

  override def loadTable(ident: Identifier): Table =
    loadTable(ident, Map.empty[String, String])

  /** SQL `VERSION AS OF v` — a commit_seq, or a snapshot id. An
    * all-digit string resolves as a commit_seq when one with that
    * number is retained, else falls back to a snapshot NAMED by the
    * digits (a metadata-scale peek: one manifest-key LIST); anything
    * non-numeric is a snapshot id. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val numericSeq = version.nonEmpty && version.forall(_.isDigit) && {
      val p = identPath(ident)
      val dir = GraftTableMeta.read(fsys, p).flatMap(_.location)
        .getOrElse(p.toString)
      Manifest.history(spark, dir).exists(_.seq.toString == version)
    }
    loadTable(ident,
      if (numericSeq) Map("versionasof" -> version)
      else Map("snapshotasof" -> version))
  }

  /** SQL `TIMESTAMP AS OF t` — Spark hands MICROseconds since epoch. */
  override def loadTable(ident: Identifier, timestamp: Long): Table =
    loadTable(ident, Map("timestampasof" -> (timestamp / 1000L).toString))

  private def loadTable(ident: Identifier, timeTravel: Map[String, String]): Table = {
    val p = identPath(ident)
    if (!isTable(p)) throw new NoSuchTableException(ident)
    val meta = GraftTableMeta.read(fsys, p)
    val dir = meta.flatMap(_.location).getOrElse(p.toString)
    new GraftCatalogTable(
      (ident.namespace :+ ident.name).mkString(s"$catalogName.", ".", ""),
      dir, meta, timeTravel)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: java.util.Map[String, String])
      : Table = {
    val ns = nsPath(ident.namespace)
    if (!fsys.exists(ns) || isTable(ns))
      throw new NoSuchNamespaceException(ident.namespace)
    val p = identPath(ident)
    if (isTable(p)) throw new TableAlreadyExistsException(ident)
    val partCols = partitions.toSeq.map {
      case t if t.name == "identity" && t.references.length == 1 =>
        t.references.head.fieldNames.mkString(".")
      case other => throw new UnsupportedOperationException(
        s"graft catalog: only identity PARTITIONED BY columns are " +
          s"supported, got $other")
    }
    partCols.foreach(c => require(schema.isEmpty || schema.fieldNames.contains(c),
      s"graft catalog: partition column '$c' is not in the table schema"))
    val props = properties.asScala.toMap
    val location = props.get(TableCatalog.PROP_LOCATION)
    location.foreach { loc =>
      require(Manifest.history(spark, loc).nonEmpty,
        s"graft catalog: LOCATION '$loc' has no committed graft " +
          "snapshot - write one first (the catalog registers existing " +
          "manifest tables; it does not create empty external ones)")
    }
    require(schema.nonEmpty || location.nonEmpty,
      "graft catalog: CREATE TABLE needs a column list or a LOCATION " +
        "pointing at an existing graft table")
    val keepProps = props -- Seq(TableCatalog.PROP_LOCATION,
      TableCatalog.PROP_IS_MANAGED_LOCATION, TableCatalog.PROP_EXTERNAL,
      TableCatalog.PROP_PROVIDER, TableCatalog.PROP_OWNER)
    val meta = GraftTableMeta(
      // an external registration defers the schema to the target's
      // manifest — the sidecar must not freeze a schema it doesn't own
      schema = if (location.isDefined) None else Some(schema),
      partitionCols = partCols, location = location, properties = keepProps)
    fsys.mkdirs(p)
    GraftTableMeta.write(fsys, p, meta)
    loadTable(ident)
  }

  /** SCHEMA EVOLUTION on the catalog's own face: `ALTER TABLE … ADD
    * COLUMN` (top-level, nullable — pre-evolution snapshots read the
    * new column null-filled through the declared-schema scan) and
    * `SET/UNSET TBLPROPERTIES`. The change lands in the DDL sidecar —
    * a KB-sized metadata write; ZERO data files move, exactly Delta's
    * metadata-only evolution. The sidecar schema then becomes the
    * authoritative read contract (it already wins over recovery in
    * [[GraftCatalogTable.schema]] and [[graft.sources.GraftSource
    * .buildRelation]]), the next INSERT must supply the column, and
    * the table-format exports re-declare the schema on their next
    * refresh. Everything else (drop/rename/retype a column) is
    * refused loudly: those require rewriting history or per-file
    * column mapping to be sound. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val p = identPath(ident)
    if (!isTable(p)) throw new NoSuchTableException(ident)
    val meta0 = GraftTableMeta.read(fsys, p).getOrElse(
      GraftTableMeta(None, Nil, None, Map.empty))
    val dir = meta0.location.getOrElse(p.toString)
    // the pre-change effective schema: declared, else recovered from
    // the current snapshot (an ALTER on a recovery-schema table
    // freezes the recovered schema as the new declared contract)
    def effective: StructType = meta0.schema.getOrElse {
      require(Manifest.history(spark, dir).nonEmpty,
        s"graft catalog: ${ident} has neither a declared schema nor a " +
          "committed snapshot to evolve")
      StructType(Manifest.read(spark, dir).schema
        .map(_.copy(nullable = true)))
    }
    val reserved = Set(TableCatalog.PROP_LOCATION, TableCatalog.PROP_PROVIDER,
      TableCatalog.PROP_EXTERNAL, TableCatalog.PROP_OWNER,
      TableCatalog.PROP_IS_MANAGED_LOCATION)
    val meta1 = changes.foldLeft(meta0) { (m, ch) =>
      ch match {
        case add: TableChange.AddColumn =>
          require(add.fieldNames.length == 1,
            "graft catalog: only top-level ADD COLUMN is supported " +
              s"(got ${add.fieldNames.mkString(".")})")
          val nm = add.fieldNames.head
          val sch = m.schema.getOrElse(effective)
          require(!sch.fieldNames.exists(_.equalsIgnoreCase(nm)),
            s"graft catalog: column '$nm' already exists")
          require(add.isNullable,
            s"graft catalog: added column '$nm' must be nullable - " +
              "rows written before the evolution null-fill it")
          require(add.defaultValue == null,
            s"graft catalog: DEFAULT values on added columns are not " +
              "supported (pre-evolution rows read as NULL)")
          val f0 = StructField(nm, add.dataType, nullable = true)
          val f = Option(add.comment).fold(f0)(f0.withComment)
          val fields = Option(add.position()) match {
            case None => sch.fields :+ f
            case Some(after: TableChange.After) =>
              val i = sch.fieldNames.indexWhere(
                _.equalsIgnoreCase(after.column))
              require(i >= 0,
                s"graft catalog: AFTER column '${after.column}' not found")
              val (pre, post) = sch.fields.splitAt(i + 1)
              pre ++ (f +: post)
            case Some(_) => f +: sch.fields // FIRST
          }
          m.copy(schema = Some(StructType(fields)))
        case sp: TableChange.SetProperty =>
          require(!reserved.contains(sp.property),
            s"graft catalog: property '${sp.property}' is reserved")
          m.copy(properties = m.properties + (sp.property -> sp.value))
        case rp: TableChange.RemoveProperty =>
          m.copy(properties = m.properties - rp.property)
        case other =>
          throw new UnsupportedOperationException(
            s"graft catalog: unsupported ALTER TABLE change $other " +
              "(supported: ADD COLUMN, SET/UNSET TBLPROPERTIES; " +
              "drop/rename/retype would need history rewrite or " +
              "column mapping)")
      }
    }
    GraftTableMeta.write(fsys, p, meta1)
    // LOCATION-registered tables: the path face recovers its sidecar
    // from the DATA dir, so the evolved contract must land there too —
    // otherwise the same bytes read with two different schemas
    // depending on the face (catalog vs path)
    meta0.location.foreach { loc =>
      val lp = new Path(loc)
      val lfs = lp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      GraftTableMeta.write(lfs, lp,
        meta1.copy(location = None))
    }
    // resolved relations are snapshot-AND-schema pinned: invalidate so
    // the next statement sees the evolved contract
    spark.catalog.refreshByPath(dir)
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val p = identPath(ident)
    if (!isTable(p)) return false
    fsys.delete(p, true)
  }

  override def renameTable(oldIdent: Identifier, rawNewIdent: Identifier): Unit = {
    // `RENAME TO a.b.c` hands the target name verbatim — when the user
    // re-qualified it with this catalog's name, strip that first part
    // (the same normalization delta's catalog performs)
    val newIdent =
      if (rawNewIdent.namespace.headOption.contains(catalogName))
        Identifier.of(rawNewIdent.namespace.tail, rawNewIdent.name)
      else rawNewIdent
    val from = identPath(oldIdent)
    if (!isTable(from)) throw new NoSuchTableException(oldIdent)
    val toNs = nsPath(newIdent.namespace)
    if (!fsys.exists(toNs) || isTable(toNs))
      throw new NoSuchNamespaceException(newIdent.namespace)
    val to = identPath(newIdent)
    if (isTable(to)) throw new TableAlreadyExistsException(newIdent)
    require(fsys.rename(from, to),
      s"graft catalog: rename $from -> $to failed")
  }

  // ---- stored procedures (CALL <cat>.system.<proc>(...)) ------------------

  /** A procedure argument naming a table of THIS catalog ("db.t",
    * "<catalog>.db.t" — the fully-qualified form users write
    * everywhere else normalizes like [[renameTable]]'s — or "t" under
    * a single namespace) → its manifest dir plus the sidecar's declared
    * partition columns, through the same LOCATION redirect as table
    * resolution. */
  private[catalog] def resolveTable(name: String): (String, Seq[String]) = {
    require(name != null && name.nonEmpty,
      "graft catalog: the procedure's table argument must be a " +
        "non-null table name")
    val raw = name.split('.').toSeq
    require(raw.forall(_.nonEmpty),
      s"graft catalog: malformed table name '$name'")
    val parts =
      if (raw.size > 1 && raw.head == catalogName) raw.tail else raw
    val ident = Identifier.of(parts.init.toArray, parts.last)
    val rootP = identPath(ident)
    // single-part names address root-level tables first; when no such
    // table exists and the warehouse has exactly ONE namespace, resolve
    // under it (the documented convenience for `table => 't'`)
    val p =
      if (isTable(rootP) || parts.size > 1) rootP
      else listNamespaces().toSeq match {
        case Seq(ns) =>
          val cand = identPath(Identifier.of(ns, parts.last))
          if (isTable(cand)) cand else rootP
        case _ => rootP
      }
    require(isTable(p), s"graft catalog: no table '$name' under $warehouse")
    val meta = GraftTableMeta.read(fsys, p)
    (meta.flatMap(_.location).getOrElse(p.toString),
      meta.map(_.partitionCols).getOrElse(Nil))
  }

  private lazy val procedures = GraftProcedures.all(this)

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    require(ident.namespace.toSeq == Seq("system"),
      s"graft catalog: procedures live in the 'system' namespace " +
        s"(got ${ident.namespace.mkString(".")})")
    procedures.getOrElse(ident.name,
      throw new UnsupportedOperationException(
        s"graft catalog: no procedure '${ident.name}' " +
          s"(available: ${procedures.keys.toSeq.sorted.mkString(", ")})"))
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.toSeq != Seq("system")) Array.empty
    else procedures.keys.toSeq.sorted
      .map(n => Identifier.of(Array("system"), n)).toArray

  // ---- namespaces --------------------------------------------------------

  override def listNamespaces(): Array[Array[String]] = {
    val root = new Path(warehouse)
    if (!fsys.exists(root)) return Array.empty
    fsys.listStatus(root).toSeq.filter(_.isDirectory).map(_.getPath)
      .filterNot(isTable).map(p => Array(p.getName)).sortBy(_.head).toArray
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    val p = nsPath(namespace)
    if (!fsys.exists(p) || isTable(p))
      throw new NoSuchNamespaceException(namespace)
    fsys.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath)
      .filterNot(isTable).map(c => namespace :+ c.getName)
      .sortBy(_.mkString(".")).toArray
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty ||
      scala.util.Try {
        val p = nsPath(namespace); fsys.exists(p) && !isTable(p)
      }.getOrElse(false)

  override def loadNamespaceMetadata(namespace: Array[String])
      : java.util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(namespace)
    Map(SupportsNamespaces.PROP_LOCATION -> nsPath(namespace).toString)
      .asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: java.util.Map[String, String]): Unit = {
    if (namespaceExists(namespace))
      throw new NamespaceAlreadyExistsException(namespace)
    fsys.mkdirs(nsPath(namespace))
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft catalog: ALTER NAMESPACE is not supported")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    val p = nsPath(namespace)
    if (!namespaceExists(namespace)) return false
    if (!cascade && fsys.listStatus(p).nonEmpty)
      throw new IllegalStateException(
        s"graft catalog: namespace ${namespace.mkString(".")} is not " +
          "empty - use DROP NAMESPACE ... CASCADE")
    fsys.delete(p, true)
  }
}

/** The `.graft-table.json` DDL sidecar (see [[GraftCatalog]] scaladoc
  * for what it carries and why a manifest alone cannot). */
private[graft] final case class GraftTableMeta(schema: Option[StructType],
    partitionCols: Seq[String], location: Option[String],
    properties: Map[String, String])

private[graft] object GraftTableMeta {
  val SidecarName = ".graft-table.json"

  def write(fsys: FileSystem, tableDir: Path, meta: GraftTableMeta): Unit = {
    val j = JObject(List(
      "version" -> JInt(1),
      "schemaJson" -> meta.schema.map(s => JString(s.json)).getOrElse(JNothing),
      "partitionCols" -> JArray(meta.partitionCols.map(JString(_)).toList),
      "location" -> meta.location.map(JString(_)).getOrElse(JNothing),
      "properties" -> JObject(meta.properties.toList.sortBy(_._1)
        .map { case (k, v) => k -> (JString(v): JValue) })))
    val out = fsys.create(new Path(tableDir, SidecarName), true)
    try out.write(JsonMethods.pretty(JsonMethods.render(j))
      .getBytes("UTF-8"))
    finally out.close()
  }

  def read(fsys: FileSystem, tableDir: Path): Option[GraftTableMeta] = {
    val p = new Path(tableDir, SidecarName)
    if (!fsys.exists(p)) return None
    val in = fsys.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val j = JsonMethods.parse(text)
    def str(f: String): Option[String] = j \ f match {
      case JString(s) => Some(s); case _ => None
    }
    Some(GraftTableMeta(
      schema = str("schemaJson")
        .map(s => org.apache.spark.sql.types.DataType.fromJson(s)
          .asInstanceOf[StructType]),
      partitionCols = j \ "partitionCols" match {
        case JArray(xs) => xs.collect { case JString(s) => s }
        case _ => Nil
      },
      location = str("location"),
      properties = j \ "properties" match {
        case JObject(fields) =>
          fields.collect { case (k, JString(v)) => k -> v }.toMap
        case _ => Map.empty
      }))
  }
}

/**
 * The catalog's `Table`: name + schema + partitioning for the
 * analyzer/DESCRIBE, a snapshot-pinned V1 relation for
 * [[GraftCatalogReadRule]] to swap in, and the `V1Write` fallback for
 * AppendData/Overwrite (INSERT, CTAS). Capabilities deliberately omit
 * BATCH_READ: reads are served by the swap rule's `HadoopFsRelation`,
 * and a session without the graft extensions fails LOUDLY at planning
 * instead of silently taking a slower scan path.
 */
private[graft] class GraftCatalogTable(ident: String, val dir: String,
    meta: Option[GraftTableMeta], timeTravel: Map[String, String])
    extends Table with SupportsWrite {

  private def spark: SparkSession = SparkSession.active

  /** The pinned V1 relation (None while the table has no commits —
    * a declared-only table reads as empty). Resolved ONCE per loaded
    * table: the statement's analysis and execution see one snapshot. */
  lazy val relation: Option[BaseRelation] =
    if (Manifest.history(spark, dir).isEmpty) {
      require(timeTravel.isEmpty,
        s"graft catalog: $ident has no committed snapshot to time-travel to")
      None
    } else Some(graft.sources.GraftSource.buildRelation(spark, dir, timeTravel,
      meta.flatMap(_.schema)))

  override def name(): String = ident

  override lazy val schema: StructType =
    meta.flatMap(_.schema).orElse(relation.map(_.schema)).getOrElse(
      throw new IllegalStateException(
        s"graft catalog: $ident has neither a declared schema nor a " +
          "committed snapshot"))

  override def partitioning(): Array[Transform] = {
    val declared = meta.map(_.partitionCols).getOrElse(Nil)
    val cols =
      if (declared.nonEmpty) declared
      else graft.sources.GraftSource.uniformPartitionColsOf(spark, dir)
    cols.map(Expressions.identity).toArray
  }

  override def properties(): java.util.Map[String, String] =
    (meta.map(_.properties).getOrElse(Map.empty) +
      (TableCatalog.PROP_LOCATION -> dir) +
      (TableCatalog.PROP_PROVIDER -> "graft")).asJava

  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE).asJava

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftWriteBuilder(dir,
      meta.map(_.partitionCols).getOrElse(Nil))
}

/** `V1Write` fallback: INSERT INTO → Manifest append (rebases on lost
  * CAS races), INSERT OVERWRITE / CTAS-replace → truncate() → a fresh
  * overwriting snapshot (time travel keeps the pre-write state). The
  * declared partition columns drive the hive layout; a table without
  * declared partitioning keeps its current snapshot's layout. */
private[graft] class GraftWriteBuilder(dir: String, declaredPartCols: Seq[String])
    extends WriteBuilder with SupportsTruncate {
  private var overwrite = false

  override def truncate(): WriteBuilder = { overwrite = true; this }

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: org.apache.spark.sql.DataFrame,
            ignored: Boolean): Unit = {
          val spark = data.sparkSession
          val partCols =
            if (declaredPartCols.nonEmpty) declaredPartCols
            else graft.sources.GraftSource.uniformPartitionColsOf(spark, dir)
          graft.sources.GraftInsert.commit(spark, dir, partCols, data, overwrite)
          spark.catalog.refreshByPath(dir)
        }
      }
  }
}
