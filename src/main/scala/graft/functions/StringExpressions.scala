package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Jaro-Winkler string similarity as a native codegen'd expression — the
 * fuzzy-match primitive record-linkage joins are built on (Spark ships
 * only `levenshtein`; cf. reference validation-style name matching,
 * /root/reference/python_scripts/test_data.py:41-54 compares column NAME
 * sets — entity resolution at scale needs the fuzzy version).
 *
 * Semantics match the textbook algorithm exactly as DuckDB implements it
 * (`jaro_winkler_similarity`): match window ⌊max(l1,l2)/2⌋−1, greedy
 * left-to-right matching, half-count transpositions, Winkler prefix boost
 * p=0.1 over ≤4 chars applied only when jaro > 0.7, and 0.0 when either
 * side is empty (including both-empty — DuckDB's convention). Verified
 * value-for-value against DuckDB in StringExpressionsSpec and by the
 * q_jaro_pairs oracle.
 */
object JaroWinklerAlgo {

  /** Pure double-precision Jaro-Winkler on UTF-16 code units. Called from
    * both interpreted eval and generated code (static forwarder). */
  def compute(a: String, b: String): Double = {
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val matched1 = new Array[Boolean](l1)
    val matched2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!matched2(j) && a.charAt(i) == b.charAt(j)) {
          matched1(i) = true
          matched2(j) = true
          m += 1
          done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars from each side in order; every
    // position where they disagree contributes half a transposition
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (matched1(i)) {
        while (!matched2(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (md - t / 2) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    while (prefix < math.min(4, math.min(l1, l2)) &&
        a.charAt(prefix) == b.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}

case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType == StringType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler expects (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerAlgo.compute(
      a.asInstanceOf[UTF8String].toString, b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerAlgo.compute($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object StringFunctions {
  private val FnName = "jaro_winkler"

  /** Register `jaro_winkler` in the session's function registry
    * (idempotent) — same surfacing pattern as [[VectorFunctions]]. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => JaroWinkler(exprs(0), exprs(1)), "scala_udf")

  /** Expression-string form: operands must be resolvable column names in
    * the current plan; requires `register(spark)` first. */
  def jaroWinklerExpr(a: String, b: String): Column = expr(s"$FnName($a, $b)")
}
