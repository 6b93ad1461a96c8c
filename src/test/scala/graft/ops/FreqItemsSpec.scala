package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class FreqItemsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.session

  /** Zipf-ish stream: token t_k appears ~N/k times — a handful of true
    * heavy hitters over a long tail, the shape MG is built for. */
  private def zipf = {
    import spark.implicits._
    (1 to 50).flatMap(k => Seq.fill(1000 / k)(s"t_$k"))
      .toDF("tok").repartition(7) // spread across partitions so merge runs
  }

  test("heavyHitters equals the exact GROUP BY/HAVING computation") {
    val df = zipf
    val n = df.count()
    val support = 0.02
    val got = FreqItems.heavyHitters(df, "tok", support)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val threshold = math.ceil(support * n).toLong
    val expected = df.groupBy("tok").count()
      .filter(col("count") >= threshold)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("Misra-Gries candidate set is a superset of the true heavy hitters") {
    import spark.implicits._
    val df = zipf
    val n = df.count()
    val capacity = 100 // guarantees items with freq > n/101 survive
    val mg = udaf(new FreqItems.MisraGries(capacity),
      org.apache.spark.sql.Encoders.STRING)
    val cand = df.agg(mg(col("tok")).as("mg")).select(col("mg.items"))
      .head().getMap[String, Long](0).keySet
    val mustHave = df.groupBy("tok").count()
      .filter(col("count") > n / (capacity + 1))
      .collect().map(_.getString(0)).toSet
    assert(mustHave.subsetOf(cand))
  }

  test("heavyHitters rejects degenerate support") {
    val df = zipf
    assertThrows[IllegalArgumentException](
      FreqItems.heavyHitters(df, "tok", 0.0))
    assertThrows[IllegalArgumentException](
      FreqItems.heavyHitters(df, "tok", 1.0))
  }
}
