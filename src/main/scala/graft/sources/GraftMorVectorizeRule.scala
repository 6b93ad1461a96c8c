package graft.sources

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

/**
 * Clears the merge-on-read scan ceiling: a READ of a graft snapshot
 * carrying MOR position deletes resolves to [[GraftMorRelation]] — a
 * V1 `PrunedFilteredScan` whose `buildScan` crosses an
 * `InternalRow → Row → InternalRow` boundary and caps whole-stage
 * codegen at the relation edge. This rule swaps each remaining
 * occurrence of that relation for the SAME pinned snapshot's OPTIMIZED
 * library plan — a broadcast anti-join over Spark's own vectorized
 * parquet scans — under the relation's original output ids
 * (pass-through Project), so a table with standing deletes reads at
 * full native speed: vectorized decode, row-group skipping, whole-stage
 * codegen, and the planner's filters pushed straight into the inner
 * scans with no translation layer.
 *
 * Registered as an OPTIMIZER rule, deliberately not a resolution rule:
 * analysis must keep the V1 relation visible — temp views store
 * ANALYZED plans, and the SQL DML/INSERT rules ([[GraftDmlRule]],
 * [[GraftInsertRule]], `InsertableRelation`) extract the table from
 * exactly that relation; a resolution-time swap would strip it from
 * every view before a later DML statement could resolve against it.
 * By optimization time, every DML/INSERT statement has already been
 * converted to a command holding its target OUTSIDE the transformed
 * children, so whatever `GraftMorRelation` occurrences remain are
 * plain reads — all of them safe, and profitable, to vectorize.
 */
object GraftMorVectorizeRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case lr: LogicalRelation
          if lr.relation.isInstanceOf[GraftMorRelation] && !lr.isStreaming =>
        graft.plans.OutputAlign.project(lr.output,
          lr.relation.asInstanceOf[GraftMorRelation].optimizedPlan,
          Some(conf.sessionLocalTimeZone), "graft MOR read")
    }
}
