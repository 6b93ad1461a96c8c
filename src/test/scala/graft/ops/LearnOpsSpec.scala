package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** LinearFit + HistSketch + the threshold sweep / source overlap /
  * retrieval composites (queries/Learn.scala surface). */
class LearnOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.session
  import spark.implicits._

  // ---- LinearFit ---------------------------------------------------------

  test("fitOls2 recovers an exactly-linear relationship with r2 = 1") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 200).map { _ =>
      val x1 = rnd.nextInt(50).toLong
      val x2 = rnd.nextInt(30).toLong
      (2L + 3L * x1 + 5L * x2, x1, x2)
    }
    val got = LinearFit.fitOls2(rows.toDF("y", "x1", "x2"), "y", "x1", "x2")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(got("b0") - 2.0) < 1e-9)
    assert(math.abs(got("b1") - 3.0) < 1e-9)
    assert(math.abs(got("b2") - 5.0) < 1e-9)
    assert(math.abs(got("r2") - 1.0) < 1e-12)
  }

  test("fitOls2 matches a sequential normal-equation solve on noisy data") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 500).map { _ =>
      val x1 = rnd.nextInt(100).toLong
      val x2 = rnd.nextInt(100).toLong
      (10L + 2L * x1 - x2 + rnd.nextInt(21) - 10L, x1, x2)
    }
    val got = LinearFit.fitOls2(rows.toDF("y", "x1", "x2"), "y", "x1", "x2")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    // sequential reference: exact Long sufficient statistics, same Cramer tree
    val n = rows.size.toDouble
    def s(f: ((Long, Long, Long)) => Long): Double = rows.map(f).sum.toDouble
    val (sx1, sx2, sy) = (s(_._2), s(_._3), s(_._1))
    val (sx1x1, sx1x2, sx2x2) = (s(r => r._2 * r._2), s(r => r._2 * r._3), s(r => r._3 * r._3))
    val (sx1y, sx2y, syy) = (s(r => r._2 * r._1), s(r => r._3 * r._1), s(r => r._1 * r._1))
    def det3(a11: Double, a12: Double, a13: Double, a21: Double, a22: Double,
        a23: Double, a31: Double, a32: Double, a33: Double): Double =
      a11 * (a22 * a33 - a23 * a32) - a12 * (a21 * a33 - a23 * a31) + a13 * (a21 * a32 - a22 * a31)
    val det = det3(n, sx1, sx2, sx1, sx1x1, sx1x2, sx2, sx1x2, sx2x2)
    val b0 = det3(sy, sx1, sx2, sx1y, sx1x1, sx1x2, sx2y, sx1x2, sx2x2) / det
    val b1 = det3(n, sy, sx2, sx1, sx1y, sx1x2, sx2, sx2y, sx2x2) / det
    val b2 = det3(n, sx1, sy, sx1, sx1x1, sx1y, sx2, sx1x2, sx2y) / det
    val r2 = 1.0 - (syy - (b0 * sy + b1 * sx1y + b2 * sx2y)) / (syy - sy * sy / n)

    // identical IEEE tree over identical exact inputs ⇒ bit-identical
    assert(got("b0") == b0 && got("b1") == b1 && got("b2") == b2 && got("r2") == r2)
  }

  test("fitOls2 grouped: one pass recovers a DIFFERENT exact model per group") {
    val rnd = new scala.util.Random(37)
    val rows = (1 to 300).flatMap { _ =>
      val x1 = rnd.nextInt(50).toLong
      val x2 = rnd.nextInt(30).toLong
      Seq(("g1", 1L + 2L * x1 + 3L * x2, x1, x2),
        ("g2", 7L + 4L * x1 - 2L * x2, x1, x2))
    }
    val got = LinearFit.fitOls2(rows.toDF("g", "y", "x1", "x2"),
      "y", "x1", "x2", groupCols = Seq("g"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    for ((g, cs) <- Seq("g1" -> Seq(1.0, 2.0, 3.0), "g2" -> Seq(7.0, 4.0, -2.0)))
      for ((c, i) <- cs.zipWithIndex)
        assert(math.abs(got((g, s"b$i")) - c) < 1e-9, s"$g b$i")
    assert(math.abs(got(("g1", "r2")) - 1.0) < 1e-12)
  }

  test("fitPowerLaw recovers the exponent of an exact power law per group") {
    val rows = (1 to 60).flatMap { i =>
      val x = i.toLong
      Seq(("sq", x * x * x, x), // y = x³ → b = 3
        ("lin", 5L * x, x)) //      y = 5x → b = 1, a = ln 5
    }
    val got = LinearFit.fitPowerLaw(rows.toDF("g", "y", "x"),
      "y", "x", groupCols = Seq("g"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(math.abs(got("sq")._2 - 3.0) < 1e-6)
    assert(math.abs(got("lin")._2 - 1.0) < 1e-6)
    assert(math.abs(got("lin")._1 - math.log(5.0)) < 1e-6)
  }

  // ---- HistSketch --------------------------------------------------------

  private def mkValues(seed: Int, nRows: Int) = {
    val rnd = new scala.util.Random(seed)
    (1 to nRows).map(i => (if (i % 2 == 0) "a" else "b", rnd.nextDouble() * 480.0))
  }

  test("histogram sketch: split-build-merge state is BIT-identical to one-pass") {
    val rows = mkValues(5, 4000)
    val (left, right) = rows.splitAt(1500)
    val one = HistSketch.buildState(rows.toDF("g", "v"), Seq("g"), "v", 0.0, 500.0, 50)
    val merged = HistSketch.mergeStates(
      HistSketch.buildState(left.toDF("g", "v"), Seq("g"), "v", 0.0, 500.0, 50),
      HistSketch.buildState(right.toDF("g", "v"), Seq("g"), "v", 0.0, 500.0, 50),
      Seq("g"))
    val a = one.orderBy("g", "bin").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val b = merged.orderBy("g", "bin").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(a.sameElements(b))
  }

  test("histogram sketch quantiles are within one bin width of exact quantiles") {
    val rows = mkValues(9, 6000)
    val state = HistSketch.buildState(rows.toDF("g", "v"), Seq("g"), "v", 0.0, 500.0, 50)
    val est = HistSketch.quantiles(state, Seq("g"), Seq(0.5, 0.9, 0.99), 0.0, 500.0, 50)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val w = 10.0
    for (g <- Seq("a", "b"); q <- Seq(0.5, 0.9, 0.99)) {
      val vs = rows.filter(_._1 == g).map(_._2).sorted
      val exact = vs((math.ceil(q * vs.size).toLong.max(1L).min(vs.size.toLong) - 1).toInt)
      assert(math.abs(est((g, q)) - exact) <= w,
        s"g=$g q=$q est=${est((g, q))} exact=$exact")
    }
  }

  test("histogram sketch clamps out-of-range values instead of dropping them") {
    val df = Seq(("g", -50.0), ("g", 1e9), ("g", 5.0)).toDF("g", "v")
    val state = HistSketch.buildState(df, Seq("g"), "v", 0.0, 500.0, 50)
    assert(state.agg(sum("cnt")).head.getLong(0) == 3L) // total rank mass preserved
    val bins = state.select("bin").as[Long].collect().sorted
    assert(bins.head == 0L && bins.last == 49L)
  }

  // ---- threshold sweep ---------------------------------------------------

  test("thresholdSweep: monotone non-increasing curve; empty thresholds give zero rows") {
    val docs = Seq(
      (1L, "the cat sat on the mat today"),
      (2L, "the cat sat on the mat today"),          // exact dup of 1
      (3L, "the cat sat on the mat yesterday"),      // near dup of 1
      (4L, "completely different text entirely here now")
    ).toDF("doc_id", "text")
    val got = graft.ext.Dedup.thresholdSweep(
      docs, "doc_id", "text", Seq(0.3, 0.8, 0.99), n = 3)
      .orderBy("threshold").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq == Seq(0.3, 0.8, 0.99))
    // pairs and dropped docs never increase as the threshold tightens
    assert(got.sliding(2).forall { case Array(lo, hi) => lo._2 >= hi._2 && lo._3 >= hi._3 })
    // the exact dup pair (1,2) fires even at 0.99; doc 2 is dropped there
    assert(got.last._2 >= 1L && got.last._3 >= 1L)
    // at 0.3 the near-dup also fires
    assert(got.head._2 > got.last._2)
  }

  // ---- source overlap ----------------------------------------------------

  test("sourceOverlap: planted shared passage is counted once per direction") {
    val shared = "one two three four five"
    val docs = Seq(
      (1L, s"$shared alpha beta", "s1"),
      (2L, s"$shared gamma delta", "s2"),
      (3L, "totally different words here entirely", "s3")
    ).toDF("doc_id", "text", "source")
    val got = graft.ext.Curation.sourceOverlap(docs, "source", "text", n = 5)
      .orderBy("src_a", "src_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // only s1<->s2 share the 5-gram "one two three four five"
    assert(got.map(t => (t._1, t._2)).toSeq == Seq(("s1", "s2"), ("s2", "s1")))
    assert(got.forall(_._4 == 1L))
    // containment = shared / grams_a — 3 grams per doc (7 tokens, n=5)
    assert(got.forall(t => t._3 == 3L && math.abs(t._5 - 1.0 / 3.0) < 1e-12))
  }

  // ---- retrieval composite ----------------------------------------------

  test("chunkTexts partitions every document's tokens exactly") {
    val docs = Seq(
      (1L, (1 to 70).map(i => s"t$i").mkString(" ")),
      (2L, "a b c"),
      (3L, "")
    ).toDF("doc_id", "text")
    val got = graft.ext.Retrieval.chunkTexts(docs, "doc_id", "text", budget = 32)
      .orderBy("doc_id", "chunk_id").collect()
    // doc 1: 70 tokens → 3 chunks of 32/32/6; doc 2: 1 chunk; doc 3: none
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 0L, 32L), (1L, 1L, 32L), (1L, 2L, 6L), (2L, 0L, 3L)))
    // reassembling the chunks reproduces the token stream
    val rebuilt = got.filter(_.getLong(0) == 1L).map(_.getString(3)).mkString(" ")
    assert(rebuilt == (1 to 70).map(i => s"t$i").mkString(" "))
  }

  test("retrieveTopK returns k descending-cosine chunks in [0, 1]") {
    val docs = Seq(
      (1L, "common common common word word extra"),
      (2L, "common word something else entirely"),
      (3L, "unrelated tokens only here")
    ).toDF("doc_id", "text")
    val got = graft.ext.Retrieval.retrieveTopK(
      docs, "doc_id", "text", budget = 4, dim = 64, qTokens = 2, k = 3)
      .collect().map(_.getDouble(3))
    assert(got.length == 3)
    assert(got.forall(c => c >= -1e-12 && c <= 1.0 + 1e-12))
    assert(got.sliding(2).forall { case Array(a, b) => a >= b })
  }
}
