package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Mergeable distinct-count sketches (Apache DataSketches HLL via Spark 4's
 * `hll_sketch_agg`/`hll_union_agg`/`hll_sketch_estimate`) — the
 * approximate twin of [[IncrementalAgg]]: a per-group sketch STATE table
 * that refreshes from delta batches without rescanning history, and
 * rolls up across group levels without re-reading data at all.
 *
 * Why sketches, not `countDistinct`, at 100 TB: exact distinct needs a
 * shuffle keyed by (group, value) — shuffle volume ∝ distinct pairs. The
 * sketch is a fixed ≤ 2^lgK-register buffer per group, built with map-side
 * combine; shuffle volume is |groups| × sketch size no matter how many
 * distinct values flow in. The union is set-semantic — associative,
 * commutative, idempotent — so re-delivered batches cannot inflate the
 * count and a region∪region rollup is a sketch union, not a rescan.
 * Caveat pinned by `ApproxDistinctSpec`: DataSketches HLL promotes
 * through sparse→dense modes as it grows, so two different ingest
 * histories of the SAME data can serve estimates a fraction of a percent
 * apart — refresh ≡ rebuild within error bounds, not bit-for-bit (which
 * is also why `q_distinct_sketch` is a rows-only query: the estimate is
 * reproducible for a fixed split, not portable across engines).
 */
object ApproxDistinct {

  /** 2⁶⁰ — the KMV hash space size (60-bit md5 prefix), exact in a double. */
  private val HashSpace = 1152921504606846976.0

  /** Per-group HLL sketch state over `valueCol` (binary column `sk`). */
  def buildState(df: DataFrame, keys: Seq[String], valueCol: String,
      lgK: Int = 14): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(expr(s"hll_sketch_agg($valueCol, $lgK)").as("sk"))

  /** Fold a delta batch into existing state: sketch the delta, union by
    * group key. Cost ∝ |delta| + |groups|; history is never re-read. */
  def refresh(state: DataFrame, delta: DataFrame, keys: Seq[String],
      valueCol: String, lgK: Int = 14): DataFrame =
    state.unionByName(buildState(delta, keys, valueCol, lgK))
      .groupBy(keys.map(col): _*)
      .agg(expr("hll_union_agg(sk)").as("sk"))

  /** Serve estimates from state. */
  def serve(state: DataFrame, keys: Seq[String]): DataFrame =
    state.select(keys.map(col) :+
      expr("hll_sketch_estimate(sk)").as("approx_distinct"): _*)

  /** Roll state up to a coarser grouping (e.g. day→month) by sketch
    * union alone — no data rescan. */
  def rollup(state: DataFrame, coarserKeys: Seq[String]): DataFrame =
    state.groupBy(coarserKeys.map(col): _*)
      .agg(expr("hll_union_agg(sk)").as("sk"))

  /**
   * EXACT distinct count of a long column via mergeable roaring-style
   * bitmaps (`bitmap_construct_agg`) — the middle ground between
   * `countDistinct` and HLL: the two-level (group, bucket) aggregation
   * shuffles one ≤4 KB bitmap per 32768-value bucket instead of every
   * distinct value, the bitmap union is exact (so this CAN be oracled
   * against `COUNT(DISTINCT)` — see q_bitmap_distinct), and buckets make
   * it dense-domain-proof: memory ∝ occupied buckets. The right tool when
   * ids are integers and the count must be exact; HLL when a % error buys
   * a 100× smaller state.
   */
  def exactDistinctBitmap(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame = {
    val buckets = df
      .groupBy((keys.map(col) :+ expr(s"bitmap_bucket_number($valueCol)").as("__bkt")): _*)
      .agg(expr(s"bitmap_construct_agg(bitmap_bit_position($valueCol))").as("__bm"))
    buckets.groupBy(keys.map(col): _*)
      .agg(sum(expr("bitmap_count(__bm)")).as("exact_distinct"))
  }

  // --------------------------------------------------------------------
  // KMV (k-minimum-values) sketch — the PORTABLE approximate distinct.
  //
  // State per group: the k smallest DISTINCT 60-bit hashes of the values,
  // where hash = first 15 md5 hex chars of the value's string form (the
  // engine-wide content-hash convention — Sampling/Dedup use the same).
  // Estimator: exact count while fewer than k distinct hashes have been
  // seen; otherwise (k−1)·2⁶⁰ / h_k with h_k the k-th smallest hash
  // (Bar-Yossef et al. 2002; σ ≈ 1/√(k−2)).
  //
  // Why this exists next to the HLL sketch: KMV state is a pure SET
  // operation — merge = union-then-take-k-smallest — so unlike
  // DataSketches HLL (sparse→dense promotion makes different ingest
  // histories differ by fractions of a percent, pinning q_distinct_sketch
  // to a rows-only check) the KMV estimate is BIT-IDENTICAL across any
  // split/merge order AND recomputable in portable SQL: a DuckDB oracle
  // rebuilds the same hashes, picks the same k-th minimum, and applies
  // the same IEEE formula. Approximate yet hash-matchable.
  //
  // Scale shape: the bounded Aggregator keeps ≤k longs per partial
  // buffer, so map-side combine collapses each partition to k values and
  // the shuffle carries |groups|·k — same contract as the HLL state,
  // ~8·k bytes per group.

  /** Bounded k-minimum-distinct-values aggregator. Buffer is DESCENDING
    * (head = current cutoff max) so the common case — a hash above the
    * cutoff once the buffer is warm — rejects on one comparison. */
  class KmvAgg(k: Int) extends Aggregator[Long, List[Long], Seq[Long]] {
    override def zero: List[Long] = Nil
    override def reduce(buf: List[Long], h: Long): List[Long] = insert(buf, h)
    override def merge(a: List[Long], b: List[Long]): List[Long] =
      b.foldLeft(a)(insert)
    /** ascending k-minimum set, ready for element_at(k) = h_k */
    override def finish(buf: List[Long]): Seq[Long] = buf.reverse
    private def insert(buf: List[Long], h: Long): List[Long] =
      if (buf.length >= k && h >= buf.head) buf
      else if (buf.contains(h)) buf
      else {
        val merged = (h :: buf).sorted(Ordering[Long].reverse)
        if (merged.length > k) merged.tail else merged
      }
    override def bufferEncoder: Encoder[List[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** The engine-wide portable 60-bit content hash of a value. */
  def kmvHash(value: Column): Column =
    conv(substring(md5(value.cast("string")), 1, 15), 16, 10).cast(LongType)

  /** Per-group KMV state: ascending array column `kmv` of ≤k hashes plus
    * `kmv_k`, the k it was built with — the state is SELF-DESCRIBING, so
    * serving can never misread a saturated small-k sketch as an exact
    * count by assuming a larger k. */
  def kmvBuildState(df: DataFrame, keys: Seq[String], valueCol: String,
      k: Int = 256): DataFrame = {
    val agg = udaf(new KmvAgg(k), Encoders.scalaLong)
    df.filter(col(valueCol).isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(agg(kmvHash(col(valueCol))).as("kmv"))
      .withColumn("kmv_k", lit(k))
  }

  /** Merge two KMV state columns: distinct union, keep the k smallest —
    * associative, commutative, idempotent, and bit-exact (a pure column
    * expression: rollups/refreshes never rescan data). */
  def kmvMerge(a: Column, b: Column, k: Int = 256): Column =
    slice(array_sort(array_union(a, b)), 1, k)

  /** Roll KMV state up to a coarser grouping (day→month, region→global)
    * WITHOUT rescanning data: explode member hashes, keep the k smallest
    * distinct per coarse group. Because the merge is an exact set
    * operation, the rolled-up state is BIT-IDENTICAL to building directly
    * at the coarse level — which is what lets a DuckDB oracle check a
    * rollup-served estimate with a plain single-pass query. */
  def kmvRollup(state: DataFrame, coarserKeys: Seq[String], k: Int = 256): DataFrame = {
    // k-mismatch guard EMBEDDED in the first key column (pruning-proof);
    // a generator cannot nest inside when(), so the guard rides the key
    val guardedHead = when(
      assert_true(col("kmv_k") === lit(k),
        lit(s"kmvRollup: state k != caller k=$k")).isNull,
      col(coarserKeys.head)).as(coarserKeys.head)
    state
      .select((guardedHead +: coarserKeys.tail.map(col)) :+ explode(col("kmv")).as("h"): _*)
      .groupBy(coarserKeys.map(col): _*)
      .agg(slice(array_sort(collect_set(col("h"))), 1, k).as("kmv"))
      .withColumn("kmv_k", lit(k))
  }

  /** Serve estimates from KMV state: exact below the state's own k,
    * (k−1)·2⁶⁰/h_k at or above — k read from the state's `kmv_k` column,
    * never assumed by the reader. Every step — int64→double conversion,
    * one multiply (exact: (k−1)·2⁶⁰ needs ≤ log₂k + 60 ≤ 53 significand
    * bits for k ≤ 2¹⁸ as a product of a small int and a power of two),
    * one divide — is a single correctly-rounded IEEE op, identical on
    * any engine. */
  def kmvServe(state: DataFrame, keys: Seq[String]): DataFrame =
    state.select(keys.map(col) ++ Seq(
      size(col("kmv")).as("n_kept"),
      when(size(col("kmv")) < col("kmv_k"), size(col("kmv")).cast("double"))
        .otherwise((col("kmv_k") - 1).cast("double") * lit(HashSpace)
          / expr("kmv[kmv_k - 1]").cast("double"))
        .as("est_distinct")): _*)

  /**
   * Set-operation estimates for two KMV states — |A∪B|, Jaccard, and
   * |A∩B| — from the sketches alone, never rescanning data. The classic
   * KMV estimators (Beyer et al., "On Synopses for Distinct-Value
   * Estimation Under Multiset Operations", SIGMOD'07): the merged sketch
   * (k smallest of the union) serves |A∪B| exactly like any KMV state;
   * the fraction ρ of its members present in BOTH input sketches is an
   * unbiased Jaccard estimate; |A∩B| = ρ·|A∪B|. Every arithmetic step is
   * a single correctly-rounded IEEE op over integers ≤2⁶⁰, so a DuckDB
   * oracle rebuilding the same md5 sketches reproduces the estimates
   * bit-for-bit — approximate answers, exactly checkable.
   *
   * Both states must share `k` (asserted via their kmv_k columns). Join
   * on `keys` is full-outer (a group absent on one side has an empty
   * sketch); with `keys` empty the two global sketches pair by cross
   * join. Cost: one tiny |groups|-row join of ≤k-element arrays.
   */
  def kmvSetOps(a: DataFrame, b: DataFrame, keys: Seq[String],
      k: Int = 256): DataFrame = {
    val emptyArr = array().cast("array<bigint>")
    val la = a.select(keys.map(col) :+ col("kmv").as("__ka") :+
      col("kmv_k").as("__kka"): _*)
    val rb = b.select(keys.map(col) :+ col("kmv").as("__kb") :+
      col("kmv_k").as("__kkb"): _*)
    val joined =
      if (keys.isEmpty) la.crossJoin(rb)
      else la.join(rb, keys, "full_outer")
    val guard = assert_true(
      coalesce(col("__kka"), lit(k)) === lit(k) &&
        coalesce(col("__kkb"), lit(k)) === lit(k),
      lit(s"kmvSetOps: state k != caller k=$k"))
    val ka = coalesce(col("__ka"), emptyArr)
    val kb = coalesce(col("__kb"), emptyArr)
    val merged = slice(array_sort(array_union(ka, kb)), 1, k)
    val nKept = size(merged)
    // the k-mismatch guard rides the when-CONDITION (evaluated for every
    // row on either branch), the same pruning-proof trick as kmvRollup's
    // key-embedded guard; assert_true yields null on success
    val estUnion = when(guard.isNull && nKept < k, nKept.cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(HashSpace)
        / element_at(merged, k).cast("double"))
    val inBoth = size(array_intersect(array_intersect(merged, ka), kb))
    val jaccard = inBoth.cast("double") / nKept.cast("double")
    joined.select(keys.map(col) ++ Seq(
      nKept.as("n_kept"),
      estUnion.as("est_union"),
      jaccard.as("jaccard"),
      (jaccard * estUnion).as("est_intersection")): _*)
  }
}
