package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class ApproxDistinctSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.session
  import spark.implicits._

  private lazy val data = (1 to 20000)
    .map(i => (i % 4, s"user_${i % 1777}")).toDF("k", "v")

  test("sketch refresh over any split tracks the rebuild within error bounds") {
    val full = ApproxDistinct.serve(
      ApproxDistinct.buildState(data, Seq("k"), "v"), Seq("k"))
      .orderBy("k").collect().map(r => (r.getInt(0), r.getLong(1))).toMap

    // HLL mode promotion (sparse->dense) is history-dependent, so a split
    // build is NOT bit-identical to a single pass — but it must stay
    // within a fraction of a percent, and set-union idempotency must hold
    val splits = Seq(
      (data.filter(col("v").substr(6, 1) < "5"), data.filter(col("v").substr(6, 1) >= "5")),
      (data.limit(0), data))
    splits.foreach { case (hist, delta) =>
      val got = ApproxDistinct.serve(
        ApproxDistinct.refresh(
          ApproxDistinct.buildState(hist, Seq("k"), "v"),
          delta, Seq("k"), "v"),
        Seq("k")).orderBy("k").collect().map(r => (r.getInt(0), r.getLong(1)))
      got.foreach { case (k, e) =>
        assert(math.abs(e - full(k)).toDouble / full(k) < 0.01, s"k=$k $e vs ${full(k)}")
      }
    }

    // idempotent in set semantics: re-delivering the whole dataset as a
    // delta cannot inflate the estimate beyond sketch error
    val redelivered = ApproxDistinct.serve(
      ApproxDistinct.refresh(
        ApproxDistinct.buildState(data, Seq("k"), "v"),
        data, Seq("k"), "v"),
      Seq("k")).orderBy("k").collect().map(r => (r.getInt(0), r.getLong(1)))
    redelivered.foreach { case (k, e) =>
      assert(math.abs(e - full(k)).toDouble / full(k) < 0.01, s"k=$k $e vs ${full(k)}")
    }

    // determinism for a FIXED split: same refresh twice -> same estimates
    def runOnce() = ApproxDistinct.serve(
      ApproxDistinct.refresh(
        ApproxDistinct.buildState(data.filter(col("k") =!= 0), Seq("k"), "v"),
        data.filter(col("k") === 0), Seq("k"), "v"),
      Seq("k")).orderBy("k").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(runOnce() === runOnce())
  }

  test("estimates land within 2% of exact; rollup unions without rescan") {
    val exact = data.groupBy("k").agg(countDistinct("v").as("d"))
      .orderBy("k").collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val est = ApproxDistinct.serve(
      ApproxDistinct.buildState(data, Seq("k"), "v"), Seq("k"))
      .orderBy("k").collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    est.foreach { case (k, e) =>
      assert(math.abs(e - exact(k)).toDouble / exact(k) < 0.02, s"k=$k e=$e exact=${exact(k)}")
    }

    // day->total style rollup: union the 4 per-k sketches into one
    val state = ApproxDistinct.buildState(data.withColumn("all", lit(1)), Seq("k", "all"), "v")
    val total = ApproxDistinct.serve(
      ApproxDistinct.rollup(state, Seq("all")), Seq("all"))
      .collect().head.getLong(1)
    val exactTotal = data.select(countDistinct("v")).collect().head.getLong(0)
    assert(math.abs(total - exactTotal).toDouble / exactTotal < 0.02, s"$total vs $exactTotal")
  }

  test("KMV: split-merge is BIT-identical to a single build; exact below k") {
    val k = 128
    def serve(st: org.apache.spark.sql.DataFrame) =
      ApproxDistinct.kmvServe(st, Seq("k"))
        .orderBy("k").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))).toSeq

    val single = serve(ApproxDistinct.kmvBuildState(data, Seq("k"), "v", k))

    // the property HLL cannot give: ANY split, merged, serves the exact
    // same doubles as the one-pass build — not "within error", identical
    val merged = ApproxDistinct.kmvBuildState(
        data.filter(col("v").substr(6, 1) < "5"), Seq("k"), "v", k)
      .select(col("k"), col("kmv").as("ka"))
      .join(ApproxDistinct.kmvBuildState(
          data.filter(col("v").substr(6, 1) >= "5"), Seq("k"), "v", k)
        .select(col("k"), col("kmv").as("kb")), Seq("k"), "full_outer")
      .select(col("k"), ApproxDistinct.kmvMerge(
        coalesce(col("ka"), array().cast("array<bigint>")),
        coalesce(col("kb"), array().cast("array<bigint>")), k).as("kmv"),
        lit(k).as("kmv_k"))
    assert(serve(merged) === single)

    // idempotent: re-merging the full state into itself changes nothing
    val self = ApproxDistinct.kmvBuildState(data, Seq("k"), "v", k)
    val remerged = self.select(col("k"),
        ApproxDistinct.kmvMerge(col("kmv"), col("kmv"), k).as("kmv"),
        col("kmv_k"))
    assert(serve(remerged) === single)

    // estimator accuracy: sigma ~ 1/sqrt(k-2) ~ 9% at k=128; allow 3 sigma
    val exact = data.groupBy("k").agg(countDistinct("v").as("d"))
      .orderBy("k").collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    single.foreach { case (kk, _, e) =>
      assert(math.abs(e - exact(kk)) / exact(kk) < 0.27, s"k=$kk e=$e exact=${exact(kk)}")
    }

    // below-k groups serve the EXACT distinct count
    val tiny = (1 to 300).map(i => (i % 3, s"u${i % 40}")).toDF("k", "v")
    val tinyServed = ApproxDistinct.kmvServe(
      ApproxDistinct.kmvBuildState(tiny, Seq("k"), "v", k), Seq("k"))
      .orderBy("k").collect()
    tinyServed.foreach { r =>
      assert(r.getInt(1) < k)
      assert(r.getDouble(2) === 40.0)
    }

    // the self-describing state means a saturated small-k sketch can
    // NEVER be misread as exact: serve follows the state's own k
    val small = ApproxDistinct.kmvBuildState(data, Seq("k"), "v", 16)
    val smallServed = ApproxDistinct.kmvServe(small, Seq("k"))
      .orderBy("k").collect()
    smallServed.foreach { r =>
      assert(r.getInt(1) === 16)       // saturated at ITS k
      assert(r.getDouble(2) > 100.0)   // estimator path, not "exactly 16"
    }
  }

  test("KMV set ops: exact below k; within sigma bounds above; empty-side safe") {
    val k = 128
    // small disjoint + overlapping sets: everything below k → all EXACT
    val xs = (1 to 60).map(i => (0, s"u$i")).toDF("k", "v")
    val ys = (31 to 90).map(i => (0, s"u$i")).toDF("k", "v")
    val small = ApproxDistinct.kmvSetOps(
      ApproxDistinct.kmvBuildState(xs, Seq("k"), "v", k),
      ApproxDistinct.kmvBuildState(ys, Seq("k"), "v", k), Seq("k"), k)
      .collect().head
    assert(small.getInt(1) === 90)                    // n_kept = |A∪B| exact
    assert(small.getDouble(2) === 90.0)               // est_union exact
    assert(small.getDouble(3) === 30.0 / 90.0)        // jaccard exact
    assert(small.getDouble(4) === (30.0 / 90.0) * 90.0)

    // saturated: B ⊂ A with |A|=1777, |B|=1200 → union 1777, J=1200/1777.
    // This fixed md5 draw serves est_union 1693.24, inBoth 91 → Ĵ=91/128
    // (cross-checked against an independent Python reference): assert the
    // exact served values — the draw is deterministic, not luck
    val bigA = (1 to 40000).map(i => (0, s"a_${i % 1777}")).toDF("k", "v")
    val bigB = (1 to 40000).map(i => (0, s"a_${577 + i % 1200}")).toDF("k", "v")
    val est = ApproxDistinct.kmvSetOps(
      ApproxDistinct.kmvBuildState(bigA, Seq("k"), "v", k),
      ApproxDistinct.kmvBuildState(bigB, Seq("k"), "v", k), Seq("k"), k)
      .collect().head
    assert(math.abs(est.getDouble(2) - 1693.2406305217) < 1e-6)
    assert(est.getDouble(3) === 91.0 / 128.0)
    assert(math.abs(est.getDouble(4) - (91.0 / 128.0) * 1693.2406305217) < 1e-6)
    // and the estimates do bracket the truth within ~3σ (σ≈1/√(k−2))
    assert(math.abs(est.getDouble(2) - 1777.0) / 1777.0 < 0.27)
    assert(math.abs(est.getDouble(3) - 1200.0 / 1777.0) < 0.12)

    // full-outer join semantics: a group present on one side only gets
    // jaccard 0 and intersection 0, union = that side's estimate
    val lonely = ApproxDistinct.kmvSetOps(
      ApproxDistinct.kmvBuildState(xs, Seq("k"), "v", k),
      ApproxDistinct.kmvBuildState(
        ys.withColumn("k", lit(1)), Seq("k"), "v", k), Seq("k"), k)
      .orderBy("k").collect()
    assert(lonely.length === 2)
    lonely.foreach { r =>
      assert(r.getInt(1) === 60)
      assert(r.getDouble(2) === 60.0)
      assert(r.getDouble(3) === 0.0)
      assert(r.getDouble(4) === 0.0)
    }

    // k-mismatch is an error, not a silent misestimate
    val e = intercept[Exception] {
      ApproxDistinct.kmvSetOps(
        ApproxDistinct.kmvBuildState(xs, Seq("k"), "v", 64),
        ApproxDistinct.kmvBuildState(ys, Seq("k"), "v", k), Seq("k"), k)
        .collect()
    }
    assert(e.getMessage.contains("kmvSetOps") ||
      e.getCause != null && e.getCause.getMessage.contains("kmvSetOps"))
  }
}
