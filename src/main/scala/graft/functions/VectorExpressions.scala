package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/**
 * Native Catalyst expression for the double-array dot product — the hot
 * inner loop of cosine similarity search and embedding dedup. A
 * `zip_with`+`aggregate` pipeline materializes a zipped array and walks a
 * lambda interpreter per element; this expression is a codegen'd tight
 * loop over the two `ArrayData` buffers (no allocation, stays inside
 * whole-stage codegen). Summation is strictly left-to-right, matching both
 * the higher-order-function formulation and DuckDB's list_dot_product, so
 * results remain oracle-hashable.
 *
 * Null handling mirrors the fold exactly, so [[VecDotRewriteRule]] is
 * semantics-preserving for ANY input, not just engine vector columns:
 * null array → null; unequal lengths → null (zip_with pads with null and
 * null poisons the fold); any null element → null. The element null
 * checks are only emitted when the array type admits nulls
 * (`containsNull`), so dense embedding columns keep the branch-free loop.
 */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  private def elementsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  })

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val checkNulls = elementsNullable
    var i = 0
    var s = 0.0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val nullCheck =
        if (elementsNullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  private val FnName = "vec_dot"

  /** Register `vec_dot` in the session's function registry (idempotent) —
    * the public way to surface a custom Expression as a Column/SQL
    * function without depending on Column internals. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => VecDot(exprs(0), exprs(1)), "scala_udf")

  /** Expression-string form: both operands must be resolvable column
    * names in the current plan; requires `register(spark)` first. */
  def vecDotExpr(a: String, b: String): Column = expr(s"$FnName($a, $b)")
}
