package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Bloom-filter membership pruning (Bloom, CACM 1970) as a BROADCASTABLE
 * BIT TABLE: the filter state is one row per SET BIT (`pos` ∈ [0, m)),
 * so it is ≤ m rows no matter how many keys built it — the property that
 * makes it the scale path for semi-join pruning when the build side's
 * KEY SET is too large to broadcast but its m-bit signature is not
 * (the same trade Spark's own runtime `bloom_filter_agg` injection
 * makes, cf. `InjectRuntimeFilter`; here it is a first-class user
 * operator with a portable hash family so an oracle can replay it).
 *
 * Probe shape: k successive BROADCAST left joins on the k probe
 * positions — zero shuffle of the probe side, one tiny exchange reused
 * k times. No false negatives ever (a true member's k positions are all
 * set by construction); false positives at the classic
 * (1 − e^(−kn/m))^k rate are then removed by an EXACT verify against
 * the real key set, so the operator's final output is exact while the
 * bloom stage does the scan-side pruning. Build is
 * explode(k)+distinct: shuffle ≤ m rows regardless of build cardinality.
 *
 * Hashes are the engine-wide portable md5-60bit family ("i:key" salted
 * per probe), so a SQL oracle rebuilds the identical bit set and the
 * false-positive COUNTS hash-match exactly — the oracle proves bloom
 * behavior, not just the verified final answer.
 */
object Bloom {

  /** Probe-i bit position of `key`: portable md5-60bit of "i:key" mod m. */
  def position(key: Column, i: Int, m: Int): Column =
    pmod(
      conv(substring(md5(concat(lit(s"$i:"), key.cast("string"))), 1, 15), 16, 10)
        .cast(LongType),
      lit(m.toLong))

  /** Filter state: one row per set bit. ≤ m rows, independent of |keys|. */
  def buildBits(df: DataFrame, keyCol: String, m: Int, k: Int): DataFrame =
    df.filter(col(keyCol).isNotNull)
      .select(explode(array((0 until k).map(i =>
        position(col(keyCol), i, m)): _*)).as("pos"))
      .distinct()

  /** Append `bloom_pass` to `df`: true iff all k positions of `keyCol`
    * are set in `bits`. k broadcast left joins (bits is distinct on
    * `pos`, so no row duplication), zero probe-side shuffle. */
  def probe(df: DataFrame, keyCol: String, bits: DataFrame, m: Int, k: Int): DataFrame = {
    val joined = (0 until k).foldLeft(df) { (acc, i) =>
      acc.join(broadcast(bits.select(col("pos").as(s"__bpos$i"))),
        position(col(keyCol), i, m) === col(s"__bpos$i"), "left")
    }
    joined
      .withColumn("bloom_pass",
        (0 until k).map(i => col(s"__bpos$i").isNotNull).reduce(_ && _))
      .drop((0 until k).map(i => s"__bpos$i"): _*)
  }
}
