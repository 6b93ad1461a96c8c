package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The extension needs its own session (extensions bind at build time). */
class GraftExtensionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    // getOrCreate would silently reuse another suite's session WITHOUT the
    // extension — clear the default so a fresh session (sharing the same
    // SparkContext) is built with the rule injected, then restore
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    prevDefault.foreach(SparkSession.setDefaultSession)
    prevActive.foreach(SparkSession.setActiveSession)
    s
  }

  test("optimizer rewrites aggregate(zip_with(*)) dot products to vec_dot") {
    // parquet-backed (a LocalRelation would be constant-folded before the
    // rewrite is observable)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val dot = emb.select(col("vec_id"),
      aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
        lit(0.0d), (acc, v) => acc + v).as("d"))
    val optimized = dot.queryExecution.optimizedPlan.toString
    assert(optimized.contains("vec_dot"), optimized)
    // rewritten result == the unoptimized fold's result (run via the
    // registered function on a plain session path for comparison)
    VectorFunctions.register(spark)
    val viaFn = emb.select(col("vec_id"), VectorFunctions.vecDotExpr("v", "v").as("d"))
    val a = dot.orderBy("vec_id").collect().map(_.getDouble(1))
    val b = viaFn.orderBy("vec_id").collect().map(_.getDouble(1))
    assert(a.sameElements(b))
  }

  test("non-matching folds are left alone") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
    // a sum fold (no multiply) must NOT be rewritten
    val sumFold = df.select(
      aggregate(col("a"), lit(0.0d), (acc, v) => acc + v).as("s"))
    assert(!sumFold.queryExecution.optimizedPlan.toString.contains("vec_dot"))
    assert(sumFold.collect().head.getDouble(0) == 3.0)
    // a product-fold with a different seed must NOT be rewritten
    val seeded = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(1.0d), (acc, v) => acc + v).as("s"))
    assert(!seeded.queryExecution.optimizedPlan.toString.contains("vec_dot"))
    assert(seeded.collect().head.getDouble(0) == 12.0)
  }
}
