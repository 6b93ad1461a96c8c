package graft.queries

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestBase}

/** Generative brute-force checks for the round-5 statistics queries: the
  * DuckDB oracle proves cross-engine agreement on the FIXTURE; these
  * prove the math itself on synthesized series with known structure
  * (planted level shifts, trends), by recomputing each estimator
  * naively on the driver. The generated `orders` table carries only the
  * columns the queries read. */
class StatsBruteForceSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.session

  /** Write an orders.parquet with `cnt` orders on each given epoch day. */
  private def ordersDir(daily: Seq[(Int, Int)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("statsbf").toString
    daily.flatMap { case (day, cnt) =>
      Seq.fill(cnt)(new Timestamp(day.toLong * 86400000L))
    }.toDF("o_orderdate").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  private def months(daily: Seq[(Int, Int)]): Seq[(String, Long)] =
    daily.groupBy { case (day, _) =>
      java.time.LocalDate.ofEpochDay(day.toLong).withDayOfMonth(1).toString
    }.view.mapValues(_.map(_._2.toLong).sum).toSeq.sortBy(_._1)

  test("changepoint finds a planted level shift and matches brute-force SSE") {
    val rng = new scala.util.Random(7)
    // 36 months of ~N(50,5) then 24 months of ~N(90,5): shift at month 36
    val daily = (0 until 60).map { m =>
      val base = if (m < 36) 50 else 90
      (m * 30 + 3, base + rng.nextInt(11) - 5)
    }
    val dir = ordersDir(daily)
    val row = SparkEntry.queries("q_changepoint")(spark, dir).collect().head
    val ms = months(daily).map(_._2)
    val n = ms.length
    def sse(k: Int): Double = {
      val (l, r) = ms.splitAt(k)
      def part(xs: Seq[Long]) = {
        val s1 = xs.sum.toDouble; val s2 = xs.map(x => x * x).sum.toDouble
        s2 - (s1 * s1) / xs.length
      }
      part(l) + part(r)
    }
    val bruteK = (1 until n).minBy(sse)
    val bruteMonth = months(daily)(bruteK - 1)._1
    assert(row.getDate(0).toString === bruteMonth)
    assert(math.abs(row.getDouble(1) - sse(bruteK)) < 1e-6)
    // the split separates the planted levels (~50 vs ~90)
    assert(row.getDouble(2) < row.getDouble(3) - 20, "means must straddle the shift")
  }

  test("robust trend recovers a planted slope and the exact Mann-Kendall S") {
    val rng = new scala.util.Random(11)
    // monthly counts ~ 40 + 2*m + noise: Sen slope should be ~2/month
    val daily = (0 until 48).map(m => (m * 30 + 3, 40 + 2 * m + rng.nextInt(5)))
    val dir = ordersDir(daily)
    val row = SparkEntry.queries("q_trend_robust")(spark, dir).collect().head
    val ms = months(daily).map(_._2)
    val mi = months(daily).map { case (mo, _) =>
      val d = java.time.LocalDate.parse(mo); d.getYear.toLong * 12 + d.getMonthValue
    }
    val pairs = for { i <- ms.indices; j <- i + 1 until ms.length }
      yield (ms(j) - ms(i), mi(j) - mi(i))
    val s = pairs.map { case (dy, _) => java.lang.Long.signum(dy).toLong }.sum
    assert(row.getLong(0) === pairs.length)
    assert(row.getLong(1) === s)
    val slopes = pairs.map { case (dy, dx) =>
      BigDecimal(dy.toDouble / dx).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.sorted
    val sen = slopes((pairs.length + 1) / 2 - 1)
    assert(math.abs(row.getDouble(3) - sen) < 1e-9, "sen slope")
    assert(row.getDouble(3) > 1.5 && row.getDouble(3) < 2.5, "planted slope ~2")
  }

  test("acf of an alternating series is strongly negative at lag 1, positive at lag 2") {
    // strict 2-day alternation 20/80 for 200 consecutive days
    val daily = (0 until 200).map(d => (d, if (d % 2 == 0) 20 else 80))
    val dir = ordersDir(daily)
    val rows = SparkEntry.queries("q_acf")(spark, dir).collect()
      .map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(rows(1) < -0.9)
    assert(rows(2) > 0.9)
    // brute force at lag 1 on the exact integer formula
    val ys = daily.map(_._2.toLong)
    val t = ys.length; val s1 = ys.sum
    val num = (1 until t).map(i => (t * ys(i) - s1) * (t * ys(i - 1) - s1)).sum
    val den = ys.map(y => (t * y - s1) * (t * y - s1)).sum
    val brute = BigDecimal(num.toDouble / den)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(rows(1) - brute) < 1e-9)
  }
}
