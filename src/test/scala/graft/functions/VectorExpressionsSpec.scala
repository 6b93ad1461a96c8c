package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class VectorExpressionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.session
  import spark.implicits._

  test("vec_dot matches the higher-order-function formulation bit-exactly") {
    VectorFunctions.register(spark)
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.1, -0.2, 0.3), Array(-0.4, 0.5, 0.6)))
      .toDF("a", "b")
    val out = df.select(
      VectorFunctions.vecDotExpr("a", "b").as("fast"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0d), (acc, v) => acc + v).as("slow"))
      .collect()
    out.foreach(r => assert(r.getDouble(0) == r.getDouble(1))) // identical bits
  }

  test("vec_dot null array yields null; SQL form works") {
    VectorFunctions.register(spark)
    val df = Seq((Some(Array(1.0, 2.0)), None: Option[Array[Double]])).toDF("a", "b")
    val r = df.selectExpr("vec_dot(a, b) AS d").collect().head
    assert(r.isNullAt(0))
  }

  test("vec_dot matches the fold on ragged lengths and null elements (null, not min-length)") {
    VectorFunctions.register(spark)
    val df = Seq(
      (Array[java.lang.Double](1.0, 2.0, 3.0), Array[java.lang.Double](4.0, 5.0)), // ragged
      (Array[java.lang.Double](1.0, null), Array[java.lang.Double](2.0, 3.0)),     // null element
      (Array.empty[java.lang.Double], Array.empty[java.lang.Double]),              // empty → 0.0
      (Array[java.lang.Double](1.5, 2.5), Array[java.lang.Double](2.0, 4.0)))      // dense
      .toDF("a", "b")
    val out = df.select(
      VectorFunctions.vecDotExpr("a", "b").as("fast"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0d), (acc, v) => acc + v).as("slow"))
      .collect()
    out.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1))
    }
  }

  test("vec_dot rejects non-double-array inputs at analysis time") {
    VectorFunctions.register(spark)
    val df = Seq((1, 2)).toDF("a", "b")
    assertThrows[Exception](df.selectExpr("vec_dot(a, b)").collect())
  }
}
