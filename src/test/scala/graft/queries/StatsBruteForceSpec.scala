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

  test("seasonality R2 matches brute force and detects a planted dow effect") {
    val rng = new scala.util.Random(13)
    // weekday 100±3, weekend 30±3 — strong weekly structure
    val daily = (0 until 280).map { d =>
      val dow = java.time.LocalDate.ofEpochDay(d.toLong).getDayOfWeek.getValue
      (d, (if (dow >= 6) 30 else 100) + rng.nextInt(7) - 3)
    }
    val dir = ordersDir(daily)
    val row = SparkEntry.queries("q_seasonality")(spark, dir).collect().head
    val byDow = daily.groupBy { case (d, _) =>
      java.time.LocalDate.ofEpochDay(d.toLong).getDayOfWeek.getValue
    }.values.map(_.map(_._2.toDouble))
    val all = daily.map(_._2.toDouble)
    val mean = all.sum / all.length
    val sst = all.map(x => (x - mean) * (x - mean)).sum
    val ssw = byDow.map { g =>
      val m = g.sum / g.length; g.map(x => (x - m) * (x - m)).sum
    }.sum
    assert(row.getLong(0) === daily.length)
    assert(math.abs(row.getDouble(1) - sst) < 1e-3, "sst")
    assert(math.abs(row.getDouble(2) - ssw) < 1e-3, "ssw")
    assert(math.abs(row.getDouble(3) - (1.0 - ssw / sst)) < 1e-6, "r2")
    assert(row.getDouble(3) > 0.9, "planted weekly effect must dominate")
  }

  test("gini matches the pairwise mean-absolute-difference identity") {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    val dir = java.nio.file.Files.createTempDirectory("statsbf").toString
    // 120 customers with lumpy order counts (incl. ties)
    val counts = (1 to 120).map(c => c.toLong -> (1 + rng.nextInt(12)).toLong)
    counts.flatMap { case (ck, n) =>
      Seq.fill(n.toInt)((new Timestamp(86400000L), ck))
    }.toDF("o_orderdate", "o_custkey").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val row = SparkEntry.queries("q_gini_orders")(spark, dir).collect().head
    val ys = counts.map(_._2.toDouble)
    val n = ys.length
    val mad = (for { a <- ys; b <- ys } yield math.abs(a - b)).sum
    val brute = mad / (2.0 * n * n * (ys.sum / n))
    assert(row.getLong(0) === n)
    assert(math.abs(row.getDouble(2) - brute) < 1e-6)
  }

  test("KS and PSI match brute force on a planted distribution shift") {
    import spark.implicits._
    val rng = new scala.util.Random(23)
    val dir = java.nio.file.Files.createTempDirectory("statsbf").toString
    // 1996 prices ~ U[0, 50000); 1997 prices ~ U[20000, 90000): clear drift
    def ts(year: Int) = Timestamp.valueOf(s"$year-06-01 00:00:00")
    val rows =
      (1 to 4000).map(_ => (rng.nextInt(50000).toDouble, ts(1996))) ++
      (1 to 5000).map(_ => (20000.0 + rng.nextInt(70000), ts(1997)))
    rows.toDF("l_extendedprice", "l_shipdate").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val ks = SparkEntry.queries("q_ks_drift")(spark, dir).collect().head
    val g1 = rows.filter(_._2.getYear + 1900 == 1996).map(_._1).sorted
    val g2 = rows.filter(_._2.getYear + 1900 == 1997).map(_._1).sorted
    val values = (g1 ++ g2).distinct.sorted
    val d = values.map { v =>
      val f1 = g1.count(_ <= v).toDouble / g1.length
      val f2 = g2.count(_ <= v).toDouble / g2.length
      math.abs(f1 - f2)
    }.max
    assert(math.abs(ks.getDouble(3) - d) < 1e-6, "KS D")
    assert(d > 0.3, "planted shift must register")
    val psi = SparkEntry.queries("q_psi_drift")(spark, dir).collect().head
    val bins1 = g1.groupBy(v => math.min(math.floor(v / 10000).toInt, 9))
    val bins2 = g2.groupBy(v => math.min(math.floor(v / 10000).toInt, 9))
    val brutePsi = (bins1.keySet intersect bins2.keySet).toSeq.map { b =>
      val p1 = bins1(b).length.toDouble / g1.length
      val p2 = bins2(b).length.toDouble / g2.length
      BigDecimal((p1 - p2) * math.log(p1 / p2))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.sum
    assert(math.abs(psi.getDouble(1) - brutePsi) < 1e-6, "PSI")
    // NB: textbook PSI excludes bins where either share is zero, which is
    // exactly where a SUPPORT shift lives — the statistic understates
    // hard drift (practitioners smooth empty bins). The brute equality
    // above is the contract; the gate here is just "clearly nonzero".
    assert(psi.getDouble(1) > 0.02, "planted drift must register")
  }

  test("Kaplan-Meier on the fixture matches a driver-side recomputation") {
    val sf = SparkTestBase.sf0001
    val rows = SparkEntry.queries("q_survival_km")(spark, sf).collect()
    val ev = QueryUtil.events(spark, sf)
      .selectExpr("user_id", "event_type", "value", "ts DIV 86400000000000 AS day")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    val sDay = ev.filter(_._2 == "signup").groupBy(_._1).view.mapValues(_.map(_._4).min).toMap
    val durs = sDay.toSeq.map { case (u, s0) =>
      val deaths = ev.filter(e => e._1 == u && e._2 == "purchase" && e._3 >= 150.0 && e._4 >= s0)
      if (deaths.nonEmpty) (deaths.map(_._4).min - s0, true)
      else (ev.filter(_._1 == u).map(_._4).max - s0, false)
    }
    var atRisk = durs.length.toLong
    var lnS = BigDecimal(0)
    val expected = durs.groupBy(_._1).toSeq.sortBy(_._1).map { case (dur, g) =>
      val d = g.count(_._2).toLong; val c = g.size - d
      val row = (dur, atRisk, d, c.toLong)
      val term = if (d > 0 && d < atRisk)
        Some(BigDecimal(math.log(1.0 - d.toDouble / atRisk))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP))
      else None
      val zero = d == atRisk
      term.foreach(lnS += _)
      atRisk -= d + c
      (row, if (zero) None else Some(lnS.toDouble), zero)
    }
    assert(rows.map(_.getLong(0)).toSeq === expected.map(_._1._1).toSeq,
      s"durations: engine=${rows.map(_.getLong(0)).mkString(",")} brute=${expected.map(_._1._1).mkString(",")}")
    assert(rows.length === expected.length)
    rows.zip(expected).foreach { case (r, ((dur, nr, d, c), ln, _)) =>
      assert(r.getLong(0) === dur); assert(r.getLong(1) === nr)
      assert(r.getLong(2) === d); assert(r.getLong(3) === c)
      ln match {
        case Some(v) => assert(math.abs(r.getDouble(5) - v) < 1e-8, s"ln_s at $dur")
        case None => assert(r.isNullAt(5))
      }
    }
  }

  test("Wilson bounds are roots of the score equation (independent of the closed form)") {
    // the closed form could be mistyped identically in engine AND oracle
    // (the ACF lesson); the defining equation (p̂−p)² = z²·p(1−p)/n is an
    // independent witness the bounds must satisfy.
    val rows = SparkEntry.queries("q_funnel_wilson")(spark, SparkTestBase.sf0001).collect()
    assert(rows.length === 2)
    val zz = 1.96 * 1.96
    rows.foreach { r =>
      val n = r.getLong(1).toDouble
      val p = r.getDouble(3)
      for (bound <- Seq(r.getDouble(4), r.getDouble(5))) {
        val lhs = (p - bound) * (p - bound)
        val rhs = zz * bound * (1.0 - bound) / n
        assert(math.abs(lhs - rhs) < 1e-9, s"score equation violated at $bound")
      }
      // p̂ = 1 makes the upper bound round to 1.0 at 9 dp — non-strict there
      assert(r.getDouble(4) < p && p <= r.getDouble(5), "bounds must bracket p-hat")
    }
  }

  test("cohort LTV matches a per-user driver recomputation on the fixture") {
    val sf = SparkTestBase.sf0001
    val rows = SparkEntry.queries("q_cohort_ltv")(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = QueryUtil.events(spark, sf)
      .selectExpr("user_id", "event_type", "value",
        "CAST(year(date_add(DATE '1970-01-01', CAST(ts DIV 86400000000000 AS INT))) * 12 "
          + "+ month(date_add(DATE '1970-01-01', CAST(ts DIV 86400000000000 AS INT))) AS BIGINT) AS midx")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    val cohort = ev.filter(_._2 == "signup").groupBy(_._1).view.mapValues(_.map(_._4).min).toMap
    val sizes = cohort.values.groupBy(identity).view.mapValues(_.size).toMap
    val rev = ev.filter(_._2 == "purchase").flatMap { case (u, _, v, m) =>
      cohort.get(u).filter(m >= _).map(c0 => (c0, m - c0) -> BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP))
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    rows.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      val cum = rev.filter { case ((c0, m), _) => c0 == key._1 && m <= key._2 }.values.sum
      val expected = (cum / sizes(key._1)).toDouble
      assert(r.getLong(2) === sizes(key._1).toLong)
      assert(math.abs(r.getDouble(3) - expected) < 1e-5, s"ltv at $key")
    }
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
  test("lorenz curve is monotone, ends at 1, and stays on or below the diagonal") {
    val rows = SparkEntry.queries("q_lorenz")(spark, SparkTestBase.sf0001).collect()
      .map(r => (r.getInt(0), r.getDouble(2)))
    assert(rows.length === 10)
    assert(math.abs(rows.last._2 - 1.0) < 1e-9, "bottom 100% must hold 100%")
    rows.sliding(2).foreach { case Array((_, a), (_, b)) => assert(a <= b, "monotone") }
    // ranked ascending by activity: bottom d/10 of customers hold AT MOST d/10 of volume
    rows.foreach { case (d, share) => assert(share <= d / 10.0 + 1e-9, s"above diagonal at $d") }
  }

  test("cusum via prefix-min identity equals the serial recursion") {
    val rng = new scala.util.Random(31)
    // quiet ~60/month, then a +25 sustained shift: the chart must climb
    val daily = (0 until 48).map(m => (m * 30 + 3, (if (m < 36) 60 else 85) + rng.nextInt(7) - 3))
    val dir = ordersDir(daily)
    val rows = SparkEntry.queries("q_cusum")(spark, dir).collect()
    val ms = months(daily).map(_._2)
    val k = ms.sum / ms.length // integer floor mean, same as the query
    var st = 0L
    val serial = ms.map { x => st = math.max(0L, st + x - k); st }
    assert(rows.map(_.getLong(2)).toSeq === serial, "prefix-min identity vs recursion")
    assert(rows.takeRight(3).forall(_.getBoolean(3)), "sustained shift must alarm")
    assert(!rows.take(12).exists(_.getBoolean(3)), "quiet period must not alarm")
  }

  test("decayed counters match a serial half-decay recomputation on planted events") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("statsbf").toString
    // "steady" fires 5/day for 12 days; "spiky" fires only on the last day (x40)
    val rows = (0 until 12).flatMap { day =>
      val ts = new Timestamp(day.toLong * 86400000L + 3600000L)
      Seq.fill(5)((ts, "steady")) ++
        (if (day == 11) Seq.fill(40)((ts, "spiky")) else Nil)
    }
    rows.toDF("ts", "event_type").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q_decayed_counts")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // serial: weights 2^-k for k = days-before-max, horizon 8 days
    val steady = (0 to 7).map(k => 5.0 * math.pow(0.5, k)).sum
    assert(got("steady")._1 === 8)
    assert(math.abs(got("steady")._2 - steady) < 1e-12)
    assert(got("spiky") === ((1L, 40.0)), "spike decayed weight 2^0 on max day")
    // recency dominance: the fresh spike outranks the steady accumulator
    assert(got("spiky")._2 > got("steady")._2)
  }

}
