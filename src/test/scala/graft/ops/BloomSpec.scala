package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class BloomSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.session

  private def keys(r: Range) = {
    import spark.implicits._
    r.map(_.toLong).toDF("key").repartition(5)
  }

  test("no false negatives: every built key bloom-passes") {
    val members = keys(1 to 400)
    val bits = Bloom.buildBits(members, "key", m = 2048, k = 3)
    val probed = Bloom.probe(members, "key", bits, m = 2048, k = 3)
    assert(probed.filter(!col("bloom_pass")).count() === 0)
  }

  test("state is bounded by m set-bit rows, independent of build size") {
    val bits = Bloom.buildBits(keys(1 to 10000), "key", m = 256, k = 3)
    assert(bits.count() <= 256)
    // saturated filter: every bit set, everything passes (degenerate but safe)
    val probed = Bloom.probe(keys(50000 to 50100), "key", bits, m = 256, k = 3)
    assert(probed.filter(!col("bloom_pass")).count() === 0)
  }

  test("false positives exist at small m and are exactly removable") {
    val members = keys(1 to 300)
    val bits = Bloom.buildBits(members, "key", m = 1024, k = 2)
    val foreign = keys(10000 to 19999)
    val passed = Bloom.probe(foreign, "key", bits, m = 1024, k = 2)
      .filter(col("bloom_pass"))
    val nFp = passed.count()
    // (1 - e^(-kn/m))^k ≈ 20% at these parameters: statistically certain
    // to be nonzero over 10k probes, and certain to be well under half.
    assert(nFp > 0, "expected some false positives at m=1024, n=300")
    assert(nFp < 5000, s"FP rate implausibly high: $nFp / 10000")
    // exact verify wipes them: no foreign key is a member
    val verified = passed.join(members.withColumnRenamed("key", "mk"),
      col("key") === col("mk"), "left_semi")
    assert(verified.count() === 0)
  }

  test("probe positions are deterministic across evaluations") {
    import spark.implicits._
    val df = Seq(42L, 7L, 99L).toDF("key")
    val once = df.select(Bloom.position(col("key"), 0, 4096).as("p"))
      .collect().map(_.getLong(0)).toSeq
    val again = df.select(Bloom.position(col("key"), 0, 4096).as("p"))
      .collect().map(_.getLong(0)).toSeq
    assert(once === again)
    assert(once.forall(p => p >= 0 && p < 4096))
    // distinct salts give distinct hash streams
    val salted = df.select(Bloom.position(col("key"), 1, 4096).as("p"))
      .collect().map(_.getLong(0)).toSeq
    assert(once !== salted)
  }
}
