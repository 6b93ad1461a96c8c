package graft.plans

import java.util.Locale

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Cast, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}

/**
 * The plan-swap projection all the graft swap rules share: wrap a
 * replacement subtree in a pass-through Project that reproduces the
 * REPLACED node's output — same names, same order, same expression ids
 * (so every already-resolved parent reference keeps binding), casting
 * where the replacement's column type differs. Columns match by exact
 * name first, then case-insensitively (the layouts the swaps reorder
 * never rename), so case-differing duplicates cannot silently collapse
 * under a case-sensitive session.
 */
object OutputAlign {

  def project(output: Seq[Attribute], child: LogicalPlan,
      timeZoneId: Option[String], what: => String): Project = {
    val exact = child.output.map(a => a.name -> a).toMap
    val ci = child.output.map(a => a.name.toLowerCase(Locale.ROOT) -> a).toMap
    val projectList: Seq[NamedExpression] = output.map { o =>
      val src = exact.getOrElse(o.name,
        ci.getOrElse(o.name.toLowerCase(Locale.ROOT),
          throw new IllegalStateException(
            s"$what: column '${o.name}' is missing from the replacement " +
              s"plan (has: ${child.output.map(_.name).mkString(", ")})")))
      val e = if (src.dataType == o.dataType) src
        else Cast(src, o.dataType, timeZoneId)
      Alias(e, o.name)(exprId = o.exprId)
    }
    Project(projectList, child)
  }
}
