package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Direct contract tests for the distributed two-pass prefix scans —
  * load-bearing for q_histogram_eqdepth / q_ks_drift / q_gini_orders /
  * q_skyline, which only exercise them through their oracles. The
  * reference implementation is the single-partition window the op
  * exists to replace: results must be BIT-identical. */
class PrefixSumSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.session

  /** Deterministic pseudo-random frame: unique order keys, lumpy
    * weights, shuffled across partitions so range bases matter. */
  private def frame(n: Int, seed: Int) = {
    import spark.implicits._
    val rng = new scala.util.Random(seed)
    rng.shuffle((1 to n).toList)
      .map(k => (k.toLong, (rng.nextInt(1000) + 1).toLong))
      .toDF("k", "w").repartition(7)
  }

  test("runningSum is bit-identical to the single-partition window sum") {
    for ((n, seed) <- Seq((1, 1), (5, 2), (1000, 3), (5000, 4))) {
      val df = frame(n, seed)
      val got = PrefixSum.runningSum(df, "k", "w", "cum")
        .select("k", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val ref = df.withColumn("cum",
          sum(col("w")).over(Window.orderBy("k")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("k", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === ref, s"n=$n seed=$seed")
    }
  }

  test("runningSum with explicit range counts still covers every row once") {
    val df = frame(997, 9)
    for (ranges <- Seq(1, 2, 31)) {
      val out = PrefixSum.runningSum(df, "k", "w", "cum", numRanges = ranges)
      assert(out.count() === 997)
      val total = df.agg(sum("w")).head().getLong(0)
      assert(out.agg(max("cum")).head().getLong(0) === total)
    }
  }

  test("staircaseMax matches the single-partition running-max window") {
    val df = frame(800, 5).withColumn("v", (col("w") % 97).cast("double"))
    val got = PrefixSum.staircaseMax(df, "k", "v", "le", "lt")
      .select("k", "le", "lt").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    val w = Window.orderBy("k")
    val ref = df
      .withColumn("le", max(col("v")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("lt", lag(col("le"), 1).over(w))
      .select("k", "le", "lt").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    assert(got === ref)
  }
  test("runningSums computes several cumulative columns in one pass, bit-identical") {
    val df = frame(1200, 11).withColumn("w2", (col("w") * 3 + 1) % 500)
    val got = PrefixSum.runningSums(df, "k", Seq("w", "w2"), Seq("c1", "c2"))
      .select("k", "c1", "c2").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val win = Window.orderBy("k")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = df
      .withColumn("c1", sum(col("w")).over(win))
      .withColumn("c2", sum(col("w2")).over(win))
      .select("k", "c1", "c2").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === ref)
  }


  test("runningSumsBy matches the per-group window, with parallelism ranges×groups") {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    // 5 lumpy groups (one holds half the rows — the serialized-domain
    // shape q_mixture_allocate hit), non-unique order keys to exercise
    // the tie-break column
    val df = rng.shuffle((1 to 3000).toList).map { i =>
      val g = if (i % 2 == 0) "en" else Seq("de", "fr", "es", "zh")(i % 4)
      (g, (i % 251).toLong, i.toLong, (rng.nextInt(900) + 1).toLong)
    }.toDF("g", "u", "id", "w").repartition(7)
    for (ranges <- Seq(0, 1, 13)) {
      val got = PrefixSum.runningSumsBy(df, "g", "u", Seq("id"), Seq("w"), Seq("cum"),
          numRanges = ranges)
        .select("g", "id", "cum").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      val win = Window.partitionBy("g").orderBy("u", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ref = df.withColumn("cum", sum(col("w")).over(win))
        .select("g", "id", "cum").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got === ref, s"ranges=$ranges")
    }
  }

  test("an all-NULL weight column within a range partition yields 0 bases, not an NPE") {
    val spark2 = spark
    import spark2.implicits._
    // 400 ordered keys, weight NULL for the entire low half: with several
    // range partitions, at least one per-range sum() is NULL (ADVICE r5)
    val df = (0L until 400L).map(k =>
        (k, if (k < 200) None else Some(k % 7 + 1))).toDF("k", "w")
    def vals(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val got = vals(PrefixSum.runningSum(df, "k", "w", "c", numRanges = 8)
      .select("k", "c").collect())
    val win = Window.orderBy("k")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = vals(df.withColumn("c", sum(col("w")).over(win))
      .select("k", "c").collect())
    // contract: bit-identical to the plain window — a NULL prefix is NULL
    // on both sides (the ADVICE fix removed only the internal NPE on the
    // all-NULL range totals, not the window's null semantics)
    assert(got === ref)
    assert(got(0L).isEmpty && got(199L).isEmpty && got(200L).contains(200L % 7 + 1))
  }
}
