package graft.sources

import java.util.Locale

import org.apache.spark.sql.catalyst.expressions.{Alias, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
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
        val child = lr.relation.asInstanceOf[GraftMorRelation].optimizedPlan
        val byName = child.output
          .map(a => a.name.toLowerCase(Locale.ROOT) -> a).toMap
        val projectList: Seq[NamedExpression] = lr.output.map { o =>
          val src = byName.getOrElse(o.name.toLowerCase(Locale.ROOT),
            throw new IllegalStateException(
              s"graft MOR read: column '${o.name}' missing from the " +
                s"snapshot plan (has: ${child.output.map(_.name).mkString(", ")})"))
          Alias(src, o.name)(exprId = o.exprId)
        }
        Project(projectList, child)
    }
}
