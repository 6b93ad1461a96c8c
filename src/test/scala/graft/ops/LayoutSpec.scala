package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class LayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.session
  import spark.implicits._

  private def mortonRef(a: Long, b: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, j) =>
      acc | (((a >> j) & 1L) << (2 * j)) | (((b >> j) & 1L) << (2 * j + 1))
    }

  test("mortonKey matches the reference bit interleave and its SQL form") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L), (12345L, 54321L))
      .toDF("a", "b")
    val got = df.select(
      col("a"), col("b"),
      Layout.mortonKey(col("a"), col("b"), 16).as("z"),
      expr(Layout.mortonKeySql("a", "b", 16)).as("zsql"))
      .as[(Long, Long, Long, Long)].collect()
    got.foreach { case (a, b, z, zsql) =>
      assert(z === mortonRef(a, b, 16), s"($a,$b)")
      assert(zsql === z, s"SQL form diverged at ($a,$b)")
    }
  }

  test("morton key is monotone on the diagonal and bounded") {
    // z(k,k) for increasing k must strictly increase (curve never revisits)
    val ks = (0L until 1000L).toDF("k")
    val zs = ks.select(Layout.mortonKey(col("k"), col("k"), 16).as("z"))
      .orderBy("z").as[Long].collect()
    assert(zs.distinct.length === 1000)
    assert(zs.forall(z => z >= 0 && z < (1L << 32)))
  }

  test("zorderCluster yields disjoint z-ranges across partitions (prunable layout)") {
    val df = (0 until 4096).map(i => (i % 64, i / 64)).toDF("a", "b")
    val clustered = Layout.zorderCluster(df, "a", "b", numPartitions = 8, bits = 6)
    val ranges = clustered
      .withColumn("z", Layout.mortonKey(col("a"), col("b"), 6))
      .withColumn("pid", spark_partition_id())
      .groupBy("pid").agg(min("z").as("lo"), max("z").as("hi"))
      .orderBy("lo").as[(Int, Long, Long)].collect()
    assert(ranges.length > 1)
    ranges.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) =>
        assert(hi1 <= lo2, "partition z-ranges overlap - files would not prune")
      case _ =>
    }
    // both dimensions get locality: MEAN partition span stays well below
    // the 63-wide domain a random shuffle would give. Per-partition hard
    // bounds would be flaky — repartitionByRange samples its boundaries
    // with a per-execution seed, so individual partitions can straddle a
    // quadrant seam differently run to run; the mean is stable.
    val dimRanges = clustered
      .withColumn("pid", spark_partition_id())
      .groupBy("pid").agg(
        (max("a") - min("a")).as("aspan"),
        (max("b") - min("b")).as("bspan"))
      .as[(Int, Int, Int)].collect()
    val meanSpan = dimRanges.map { case (_, a, b) => a + b }.sum.toDouble / (2 * dimRanges.length)
    assert(meanSpan < 45, s"mean span $meanSpan not better than random (~63)")
  }

  test("ewma matches the sequential reference fold") {
    val events = Seq(
      (1, 1L, 10L, 2.0), (1, 2L, 20L, 4.0), (1, 3L, 30L, 8.0),
      (2, 4L, 10L, 5.0) // single-element series: ewma = the element
    ).toDF("user_id", "event_id", "ts", "value")
    val got = TimeOps.ewma(events, "user_id", "ts", "value", 0.5, "event_id")
      .orderBy("user_id").as[(Int, Long, Double)].collect()
    // user 1: e1=2, e2=.5*4+.5*2=3, e3=.5*8+.5*3=5.5
    assert(got === Array((1, 3L, 5.5), (2, 1L, 5.0)))
  }
}
