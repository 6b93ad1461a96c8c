package graft.catalog

import org.apache.spark.sql.catalyst.analysis.EliminateSubqueryAliases
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.plans.logical.{InsertIntoStatement, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/**
 * Routes catalog-table READS onto the V1 fast path: every
 * `DataSourceV2Relation` over a [[GraftCatalogTable]] is swapped for
 * the table's snapshot-pinned V1 relation — the SAME
 * `HadoopFsRelation` + manifest `FileIndex` the path-based
 * `spark.read.format("graft")` face builds, so a catalog name costs
 * nothing over a path: vectorized parquet scan, manifest partition
 * pruning, footer-bounds skipping, broadcast-accurate `sizeInBytes`.
 * A DSv2 `PartitionReader` re-implementing parquet materialization
 * would be strictly slower; the swap keeps Catalyst's whole physical
 * arsenal pointed at the manifest's file list.
 *
 * The swap preserves the relation's resolved OUTPUT (same attribute
 * ids, via a pass-through Project aliased onto the V1 attributes), so
 * everything already resolved against the V2 relation — column
 * references, DML assignments, merge actions — keeps binding. That
 * also means SQL DML lands for free: a swapped `DeleteFromTable` /
 * `UpdateTable` / `MergeIntoTable` target is exactly the V1 shape
 * [[graft.sources.GraftDmlRule]] intercepts, and a swapped
 * `InsertIntoStatement`… is never produced, deliberately:
 *
 * INSERT targets are EXCLUDED from the swap (identity check on the
 * statement's table child). `InsertIntoStatement.table` is a plan
 * CHILD, so the swap could fire while the statement's query side is
 * still resolving — stranding the insert between the V2 write path
 * (which wants the V2 relation for `AppendData`) and the V1 rules
 * (which don't handle a projected target). Left alone, the built-in
 * `ResolveInsertInto` converts the statement to `AppendData`, whose
 * `table` is a non-child FIELD the transform never touches, and the
 * write executes through the table's `V1Write` onto a Manifest commit.
 *
 * A declared-but-never-written table (DDL sidecar, zero commits) reads
 * as an EMPTY relation with the declared schema — `CREATE TABLE` then
 * `SELECT` behaves like every other catalog instead of erroring.
 */
object GraftCatalogReadRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val insertTargets = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean]())
    plan.foreach {
      case i: InsertIntoStatement =>
        insertTargets.add(i.table)
        insertTargets.add(EliminateSubqueryAliases(i.table))
      // MERGE … WITH SCHEMA EVOLUTION (round 12): the target keeps its
      // V2 relation until the analyzer's own
      // ResolveMergeIntoSchemaEvolution has nothing left to evolve —
      // that rule only matches a DataSourceV2Relation target, on which
      // it computes the missing columns and drives THIS catalog's
      // alterTable (the CAS'd ADD COLUMN + schema-history commit), then
      // reloads the widened table. Once needSchemaEvolution is false
      // the swap proceeds and the V1 DML interception sees an
      // already-evolved target. While the SOURCE side is still
      // resolving, needSchemaEvolution reads false (its lazy guard
      // requires both sides resolved) — defer on that too, or a
      // multi-iteration source would let the swap fire one iteration
      // early and the evolution would never run. Try-wrapped: the lazy
      // vals must never fail the whole batch mid-resolution.
      case m: org.apache.spark.sql.catalyst.plans.logical.MergeIntoTable
          if scala.util.Try(m.schemaEvolutionEnabled).getOrElse(false) &&
            (!m.sourceTable.resolved ||
              scala.util.Try(m.needSchemaEvolution).getOrElse(true)) =>
        insertTargets.add(m.targetTable)
        insertTargets.add(EliminateSubqueryAliases(m.targetTable))
      // ALTER TABLE … ADD CONSTRAINT … CHECK: the analyzed statement
      // carries a VALIDATION SCAN child that must stay V2 end-to-end —
      // ResolveSessionCatalog probes it with `case l: LogicalRelation
      // => l.catalogTable.get` (a swapped V1 relation has no
      // session-catalog identity: None.get crash), and the
      // AddCheckConstraint PLANNER strategy pattern-matches the V2
      // relation to extract (catalog, ident, change). The validation
      // executes through the table's V1Scan shim
      // (GraftCatalogTable.newScanBuilder) — a row-based full scan,
      // fine for a one-time admin statement.
      case a: org.apache.spark.sql.catalyst.plans.logical.AddCheckConstraint =>
        a.child.foreach {
          case r: DataSourceV2Relation => insertTargets.add(r)
          case _ => ()
        }
      case _ => ()
    }
    plan.resolveOperatorsUp {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftCatalogTable]
          && !insertTargets.contains(r) =>
        swap(r)
      // `spark.readStream.table("cat.db.t")`: route the V2 streaming
      // relation onto the SAME V1 stream source a path read uses (the
      // commit-seq-offset GraftStreamSource), under the resolved
      // output ids; reader options (skipChangeCommits,
      // maxCommitsPerTrigger) pass through
      case s: org.apache.spark.sql.catalyst.streaming.StreamingRelationV2
          if s.table.isInstanceOf[GraftCatalogTable] =>
        val t = s.table.asInstanceOf[GraftCatalogTable]
        import scala.collection.JavaConverters._
        val opts = s.extraOptions.asScala.toMap + ("path" -> t.dir)
        // the DECLARED schema rides along so a declared-but-unwritten
        // table streams from creation (the CDC flow): the source idles
        // on empty history instead of failing schema resolution
        val v1 = org.apache.spark.sql.graftbridge.Bridge.v1StreamingRelation(
          org.apache.spark.sql.SparkSession.active, "graft", opts,
          Some(t.schema))
        graft.plans.OutputAlign.project(s.output, v1,
          Some(conf.sessionLocalTimeZone),
          s"graft catalog stream over ${t.name()}")
    }
  }

  private[catalog] def swap(r: DataSourceV2Relation): LogicalPlan = {
    val t = r.table.asInstanceOf[GraftCatalogTable]
    t.relation match {
      case None =>
        // declared, zero commits: an empty V1 relation the DML rule
        // still recognizes (DELETE/UPDATE no-op; MERGE = initial load)
        val rel = new graft.sources.GraftEmptyRelation(
          org.apache.spark.sql.SparkSession.active, t.dir,
          org.apache.spark.sql.types.StructType(r.output.map(a =>
            org.apache.spark.sql.types.StructField(
              a.name, a.dataType, a.nullable))))
        LogicalRelation(rel, r.output, None, false, None)
      case Some(rel) =>
        // metadata rides along: it carries the column-mapping physical
        // name a renamed column's DML scan resolves through
        val attrs = rel.schema.fields.toSeq.map(f =>
          AttributeReference(f.name, f.dataType, f.nullable, f.metadata)())
        val lr = LogicalRelation(rel, attrs, None, false, None)
        // pass-through project: reorders the V1 schema (HadoopFsRelation
        // moves partition columns last) back to the DECLARED column order
        // under the V2 relation's own expression ids
        graft.plans.OutputAlign.project(r.output, lr,
          Some(conf.sessionLocalTimeZone), s"graft catalog: ${t.name()}")
    }
  }
}
