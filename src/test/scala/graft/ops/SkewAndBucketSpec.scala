package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.io.TableIO

class SkewAndBucketSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.session
  import spark.implicits._

  test("saltedJoin equals the plain join result while spreading hot keys") {
    // one pathologically hot key
    val left = ((1 to 1000).map(i => ("hot", i)) ++ Seq(("cold", 1), ("cold2", 2)))
      .toDF("k", "v")
    val right = Seq(("hot", "H"), ("cold", "C")).toDF("k", "tag")
    val plain = left.join(right, "k").groupBy("k", "tag").count()
      .orderBy("k").collect()
    val salted = Skew.saltedJoin(left, right, "k", buckets = 8, saltBy = Seq("v"))
      .groupBy("k", "tag").count().orderBy("k").collect()
    assert(salted.sameElements(plain))
    // the salt really spreads the hot key across buckets
    val spread = left.withColumn("s", Skew.salt(8, col("v")))
      .filter(col("k") === "hot").select("s").distinct().count()
    assert(spread == 8)
  }

  test("saltedCount equals plain count per key") {
    val df = ((1 to 500).map(i => ("a", i)) ++ (1 to 7).map(i => ("b", i))).toDF("k", "v")
    val out = Skew.saltedCount(df, "k", buckets = 4, saltBy = Seq("v"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("a", 500L), ("b", 7L)))
  }

  test("bucketed tables join with no shuffle exchange") {
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      val o = spark.read.parquet(s"${SparkTestBase.sf0001}/orders.parquet")
      val l = spark.read.parquet(s"${SparkTestBase.sf0001}/lineitem.parquet")
      TableIO.writeBucketedTable(o, "orders_bkt", Seq("o_orderkey"), 4)
      TableIO.writeBucketedTable(
        l.withColumnRenamed("l_orderkey", "o_orderkey"), "lineitem_bkt", Seq("o_orderkey"), 4)
      val joined = spark.table("orders_bkt")
        .join(spark.table("lineitem_bkt"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan) // co-located: no shuffle
      assert(joined.count() == l.count()) // FK: every lineitem matches one order
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
