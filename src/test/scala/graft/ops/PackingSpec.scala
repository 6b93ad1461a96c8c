package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class PackingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.session
  import spark.implicits._

  test("packGreedy bins match a single-threaded packer over the same order") {
    val rows = Seq(
      ("en", 0L, 1500), ("en", 1L, 1000), ("en", 2L, 600), ("en", 3L, 2048),
      ("en", 4L, 1), ("de", 10L, 2047), ("de", 11L, 2))
      .toDF("lang", "doc_id", "n_tokens")
    val packed = Packing.packGreedy(rows, Seq("lang"), "doc_id", "n_tokens", 2048L)
      .select("lang", "doc_id", "seq_id", "seq_offset")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // en: starts 0,1500,2500,3100,5148 → seqs 0,0,1,1,2; offsets 0,1500,452,1052,1052
    assert(packed(("en", 0L)) == (0L, 0L))
    assert(packed(("en", 1L)) == (0L, 1500L))
    assert(packed(("en", 2L)) == (1L, 452L))
    assert(packed(("en", 3L)) == (1L, 1052L))
    assert(packed(("en", 4L)) == (2L, 1052L))
    // de is packed independently of en
    assert(packed(("de", 10L)) == (0L, 0L))
    assert(packed(("de", 11L)) == (0L, 2047L))
  }

  test("packGreedy offsets are consistent: start = seq_id*budget + seq_offset and never overlap") {
    val docs = spark.read.parquet(s"${SparkTestBase.sf0001}/documents.parquet")
      .select(col("doc_id"), col("lang"),
        size(graft.ext.TextStats.tokens(col("text"))).as("n_tokens"))
    val packed = Packing.packGreedy(docs, Seq("lang"), "doc_id", "n_tokens", 2048L)
      .select("lang", "doc_id", "n_tokens", "seq_id", "seq_offset")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    assert(packed.nonEmpty)
    packed.groupBy(_._1).foreach { case (_, g) =>
      val sorted = g.sortBy(_._2)
      var cursor = 0L
      sorted.foreach { case (_, _, n, seqId, off) =>
        assert(seqId * 2048L + off == cursor, s"start mismatch at cursor=$cursor")
        cursor += n
      }
    }
  }

  test("vocabulary ids are dense, rank-ordered, and capped") {
    val docs = spark.read.parquet(s"${SparkTestBase.sf0001}/documents.parquet")
    val vocab = graft.ext.TextStats.vocabulary(docs, "text", maxSize = 50, minCount = 2L)
      .orderBy("token_id").collect()
    assert(vocab.length <= 50 && vocab.nonEmpty)
    assert(vocab.map(_.getInt(2)).toSeq == vocab.indices)
    val counts = vocab.map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    assert(counts.forall(_ >= 2L))
  }

  test("hashSplit is exhaustive, disjoint, and growth-stable") {
    val docs = spark.read.parquet(s"${SparkTestBase.sf0001}/documents.parquet")
      .select("doc_id")
    val split = Sampling.hashSplit(docs, "doc_id")
    val byLabel = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLabel.keySet.subsetOf(Set("train", "val", "test")))
    assert(byLabel.values.sum == docs.count())
    assert(byLabel("train") > byLabel.getOrElse("val", 0L))
    // growth-stable: the assignment of a subset equals the subset of assignments
    val subset = Sampling.hashSplit(docs.filter(col("doc_id") < 100), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val full = split.filter(col("doc_id") < 100)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(subset == full)
  }

  test("balancedSample caps every stratum at the smallest stratum's size") {
    val docs = spark.read.parquet(s"${SparkTestBase.sf0001}/documents.parquet")
      .select("doc_id", "lang")
    val minN = docs.groupBy("lang").count().agg(min("count")).head().getLong(0)
    val counts = Sampling.balancedSample(docs, Seq("lang"), "doc_id")
      .groupBy("lang").count().collect().map(_.getLong(1))
    assert(counts.nonEmpty && counts.forall(_ == minN))
  }

  test("packGreedyGlobal equals the single-stratum window form across many ranges") {
    val docs = spark.read.parquet(s"${SparkTestBase.sf0001}/documents.parquet")
      .select(col("doc_id"),
        size(graft.ext.TextStats.tokens(col("text"))).as("n_tokens"))
    // reference: one constant stratum (single-partition window — test-only)
    val expected = Packing.packGreedy(
      docs.withColumn("__one", lit(1)), Seq("__one"), "doc_id", "n_tokens", 512L)
      .select("doc_id", "seq_id", "seq_offset")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // distributed two-pass form, forced through 7 uneven ranges
    val got = Packing.packGreedyGlobal(docs, "doc_id", "n_tokens", 512L, numRanges = 7)
      .select("doc_id", "seq_id", "seq_offset")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected)
  }

  test("packGreedyGlobal with tie columns: heavy ties match the window form, big ids stay exact") {
    // the order key is a SMALL-cardinality score (massive ties) and ids
    // are past the 10^6 cliff that broke the old packed-long key
    // (doc_id - score*10^6) — ties must sort by the tie column and can
    // never straddle a range (range id is a function of the score alone)
    val rng = new scala.util.Random(31)
    val docs = rng.shuffle((0 until 3000).toList).map { i =>
      val id = 1000000L * (i % 7 + 1) + i   // ids up to 7e6+
      (id, (i % 5).toLong, (rng.nextInt(300) + 1).toLong)
    }.toDF("doc_id", "score", "w").repartition(9)
    // reference: the single-partition window with the SAME composite
    // (score, doc_id) order — packGreedy alone orders by score only and
    // is nondeterministic under these ties
    val expWin = org.apache.spark.sql.expressions.Window
      .orderBy(col("score"), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val exp = docs.withColumn("start",
        (sum(col("w")).over(expWin) - col("w")).cast("long"))
      .select(col("doc_id"), floor(col("start") / lit(4096L)).cast("long").as("seq_id"),
        (col("start") % lit(4096L)).cast("long").as("seq_offset"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = Packing.packGreedyGlobal(docs, "score", "w", 4096L,
        numRanges = 5, tieCols = Seq("doc_id"))
      .select("doc_id", "seq_id", "seq_offset")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == exp)
  }

  test("chunkByBudget covers every token exactly once, chunks capped at budget") {
    val docs = spark.read.parquet(s"${SparkTestBase.sf0001}/documents.parquet")
      .select(col("doc_id"),
        size(graft.ext.TextStats.tokens(col("text"))).as("n_tokens"))
    val chunks = Packing.chunkByBudget(docs, "n_tokens", 256L)
      .select("doc_id", "n_tokens", "chunk_id", "chunk_tokens").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(chunks.nonEmpty)
    assert(chunks.forall { case (_, _, _, ct) => ct >= 1 && ct <= 256 })
    chunks.groupBy(_._1).foreach { case (_, g) =>
      val n = g.head._2.toLong
      assert(g.map(_._3).sorted.toSeq == (0L until g.length.toLong)) // contiguous ids
      assert(g.map(_._4).sum == n) // tokens partitioned exactly
    }
  }

  test("assembly plan shapes: chunk/split shuffle-free, interleave one shuffle") {
    val docs = spark.read.parquet(s"${SparkTestBase.sf0001}/documents.parquet")
    val weighted = docs.select(col("doc_id"),
      size(graft.ext.TextStats.tokens(col("text"))).as("n_tokens"))
    val pChunk = Packing.chunkByBudget(weighted, "n_tokens", 256L)
      .queryExecution.executedPlan.toString
    assert(!pChunk.contains("Exchange"), pChunk)
    val pSplit = Sampling.hashSplit(docs.select("doc_id"), "doc_id")
      .queryExecution.executedPlan.toString
    assert(!pSplit.contains("Exchange"), pSplit)
    val pMix = Mixture.interleaveByWeight(
      docs.select("doc_id", "lang"), "lang", "doc_id", Map("en" -> 2))
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllMatchIn(pMix).size == 1, pMix)
  }

  test("interleaveByWeight prefixes respect the mixture ratio") {
    val docs = spark.read.parquet(s"${SparkTestBase.sf0001}/documents.parquet")
      .select("doc_id", "lang")
    val weights = Map("en" -> 4, "de" -> 1)
    val ordered = Mixture.interleaveByWeight(
      docs.filter(col("lang").isin("en", "de")), "lang", "doc_id", weights)
      .orderBy("mix_priority", "lang", "doc_id")
      .select("lang").collect().map(_.getString(0))
    // in any prefix long enough to be past startup, en:de stays within one
    // scheduling round of 4:1
    val prefix = ordered.take(50)
    val en = prefix.count(_ == "en").toDouble
    val de = prefix.count(_ == "de").toDouble
    assert(de > 0 && en / de >= 3.0 && en / de <= 5.0, s"en=$en de=$de")
    // priorities are strictly increasing per stratum (no rank collisions)
    val pri = Mixture.interleaveByWeight(
      docs.filter(col("lang").isin("en", "de")), "lang", "doc_id", weights)
      .groupBy("lang").agg(
        countDistinct(col("mix_priority")).as("d"), count(lit(1)).as("n"))
      .collect()
    pri.foreach(r => assert(r.getLong(1) == r.getLong(2)))
  }
}
