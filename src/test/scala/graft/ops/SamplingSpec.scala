package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class SamplingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.session

  private def docs = spark.read
    .parquet(s"${SparkTestBase.sf0001}/documents.parquet")
    .select("doc_id", "lang", "source")

  test("stratifiedSample keeps at most n rows per stratum, deterministically") {
    val s1 = Sampling.stratifiedSample(docs, Seq("lang"), 5, "doc_id")
    val perStratum = s1.groupBy("lang").count().collect()
    assert(perStratum.nonEmpty)
    perStratum.foreach(r => assert(r.getLong(1) <= 5))
    // a stratum with >= 5 docs yields exactly 5
    val langSizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perStratum.foreach { r =>
      val expected = math.min(5L, langSizes(r.getString(0)))
      assert(r.getLong(1) == expected)
    }
    // deterministic: a second evaluation returns the identical id set
    val ids1 = s1.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.stratifiedSample(docs, Seq("lang"), 5, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
  }

  test("hashSample approximates the rate, is a subset, and is growth-stable") {
    val total = docs.count()
    val kept = Sampling.hashSample(docs, "doc_id", keep = 1, buckets = 4)
    val n = kept.count()
    assert(n > 0 && n < total)
    assert(math.abs(n.toDouble / total - 0.25) < 0.15)
    // growth stability: sampling a SUBSET of the corpus keeps exactly the
    // members of the full-corpus sample that survive the subset filter
    val half = docs.filter(col("doc_id") % 2 === 0)
    val keptHalf = Sampling.hashSample(half, "doc_id", keep = 1, buckets = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val keptFullEven = kept.filter(col("doc_id") % 2 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptHalf == keptFullEven)
  }

  test("weightedSample returns exactly n rows, deterministically, biased toward weight") {
    import spark.implicits._
    // weights: ids 0-99 weight 1, ids 100-199 weight 50 — the heavy half
    // must dominate a 40-row sample, without excluding the light half a
    // priori (every row has positive probability)
    val df = (0L until 200L).map(i => (i, if (i < 100) 1.0 else 50.0))
      .toDF("id", "w")
    val s1 = Sampling.weightedSample(df, "id", "w", n = 40)
    val rows = s1.collect()
    assert(rows.length == 40)
    val heavy = rows.count(_.getLong(0) >= 100L)
    assert(heavy > 30, s"heavy-weight rows should dominate, got $heavy/40")
    val ids2 = Sampling.weightedSample(df, "id", "w", n = 40)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getLong(0)).toSet == ids2)
  }
}
