package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/**
 * Optimizer rule: rewrite the portable higher-order dot-product pattern
 *
 *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)
 *
 * into the native codegen'd [[VecDot]] expression. Users (and the engine's
 * own portable formulations) write the declarative form; the optimizer
 * supplies the tight-loop physical form — the Catalyst-idiomatic way to
 * accelerate a pattern without changing any call sites.
 *
 * Semantics preserved exactly for ANY input, not just engine vector
 * columns: VecDot performs the same left-to-right double summation the
 * fold-over-zip computes, and reproduces its null behavior — unequal
 * lengths → null (zip_with pads with null, which poisons the fold) and
 * any null element → null. The rewrite only requires both sides to be
 * ArrayType(DoubleType).
 */
object VecDotRewriteRule extends Rule[LogicalPlan] {

  private object DotProductPattern {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(x1: NamedLambdaVariable, y1: NamedLambdaVariable, _), Seq(x2, y2), _)),
            Literal(0.0d, DoubleType),
            LambdaFunction(Add(accRef, vRef, _), Seq(acc, v), _),
            LambdaFunction(finishBody, Seq(finishArg), _))
          if x1.exprId == x2.exprId && y1.exprId == y2.exprId
            && isArgPair(accRef, vRef, acc, v)
            && isIdentity(finishBody, finishArg)
            && isDoubleArray(a) && isDoubleArray(b) =>
        Some((a, b))
      case _ => None
    }

    private def isDoubleArray(e: Expression): Boolean = e.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }

    // acc + v with the lambda's own variables, in either order
    private def isArgPair(l: Expression, r: Expression, acc: NamedExpression, v: NamedExpression): Boolean =
      (l, r, acc, v) match {
        case (lv: NamedLambdaVariable, rv: NamedLambdaVariable,
              av: NamedLambdaVariable, vv: NamedLambdaVariable) =>
          Set(lv.exprId, rv.exprId) == Set(av.exprId, vv.exprId)
        case _ => false
      }

    private def isIdentity(body: Expression, arg: Expression): Boolean =
      (body, arg) match {
        case (b: NamedLambdaVariable, a: NamedLambdaVariable) => b.exprId == a.exprId
        case _ => false
      }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case DotProductPattern(a, b) => VecDot(a, b)
    }
}

/** Session extension entry point:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => VecDotRewriteRule)
    // whole-operator native plans (SURVEY §1.5 ladder rung (c))
    e.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    // SQL INSERT over a graft relation must land as a MANIFEST COMMIT,
    // never as Spark's direct file write into the table dir (which
    // bypasses the manifest — rows invisible, overwrite destructive);
    // the rule runs in the main resolution batch, ahead of the built-in
    // post-hoc DataSourceAnalysis that would plan the file write
    e.injectResolutionRule(_ => graft.sources.GraftInsertRule)
    // SQL row-level DML (DELETE/UPDATE/MERGE) over graft relations:
    // Spark resolves the statements but has no V1 execution for them —
    // the rule rewrites them onto COW Manifest commits
    e.injectResolutionRule(_ => graft.sources.GraftDmlRule)
    // V2-catalog reads swap onto the V1 vectorized relation (same
    // snapshot pin, same pruning) — and thereby onto the two rules
    // above for SQL INSERT/DML on named tables
    e.injectResolutionRule(_ => graft.catalog.GraftCatalogReadRule)
    // merge-on-read READS swap onto the pinned snapshot's optimized
    // library plan (vectorized scans + broadcast anti-join). An
    // OPTIMIZER rule on purpose: analysis keeps the V1 relation
    // visible for the DML/INSERT rules and for temp-view plans
    e.injectOptimizerRule(_ => graft.sources.GraftMorVectorizeRule)
    // the SQL face of the change feed (Delta's table_changes shape):
    // SELECT * FROM graft_table_changes('cat.db.t' | '<dir>', since[, until])
    e.injectTableFunction((TableChanges.ident, TableChanges.info,
      TableChanges.build _))
  }
}
