package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.SparkTestBase

class DedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.session
  import spark.implicits._

  // two near-dup pairs (0-1 differ by one word, 4-5 identical), rest distinct
  val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again today"),
    (1L, "the quick brown fox jumps over the lazy cat again and again today"),
    (2L, "completely different text about spark catalyst optimizer internals here"),
    (3L, "yet another unrelated document mentioning parquet columnar storage formats"),
    (4L, "identical twin document full of duplicated content for testing purposes"),
    (5L, "identical twin document full of duplicated content for testing purposes"))
    .toDF("doc_id", "text")

  test("shingles: distinct word n-grams per doc") {
    val sh = Dedup.shingles(docs.limit(1), "doc_id", "text", 3).collect()
    assert(sh.length == 11) // 13 tokens -> 11 trigrams, all distinct here
    assert(sh.map(_.getString(1)).contains("the quick brown"))
  }

  test("exact Jaccard pairs find both planted near-dup pairs, nothing else") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .orderBy("d1").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((0L, 1L), (4L, 5L)))
    val j45 = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .filter(col("d1") === 4).collect().head.getDouble(2)
    assert(j45 == 1.0) // identical docs
  }

  test("prefix-filter pairs equal the exact operator's, with identical jaccard") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .orderBy("d1").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val pf = Dedup.prefixFilterPairs(docs, "doc_id", "text", 3, 0.5)
      .orderBy("d1").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pf.toSeq == exact.toSeq)
  }

  test("prefix-filter at an exact-integer t·sz boundary misses nothing") {
    // 5 distinct trigrams per doc, threshold 0.8 ⇒ t·sz = 4.0 exactly:
    // the ceil-guard case. J = 4/6 < 0.8 for (10,11); (12,13) identical J=1.
    val d = Seq(
      (10L, "a b c d e f g"), (11L, "a b c d e f x"),
      (12L, "p q r s t u v"), (13L, "p q r s t u v")).toDF("doc_id", "text")
    val exact = Dedup.jaccardPairs(d, "doc_id", "text", 3, 0.8)
      .orderBy("d1").collect().map(r => (r.getLong(0), r.getLong(1)))
    val pf = Dedup.prefixFilterPairs(d, "doc_id", "text", 3, 0.8)
      .orderBy("d1").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pf.toSeq == exact.toSeq && pf.toSeq == Seq((12L, 13L)))
  }

  test("dupFraction: identical twins fully duplicated, unique docs zero") {
    val df = Dedup.dupFraction(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(df(4L) == 1.0 && df(5L) == 1.0) // identical pair
    assert(df(2L) == 0.0 && df(3L) == 0.0) // unique docs
    assert(df(0L) > 0.5 && df(0L) < 1.0)   // near-dup shares most shingles
  }

  test("MinHash+LSH verified pairs equal the exact operator's") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("d1", "d2").orderBy("d1").collect().toSeq
    val mh = Dedup.minhashNearDupPairs(docs, "doc_id", "text",
      n = 3, numHashes = 64, bands = 21, threshold = 0.5)
      .select("d1", "d2").orderBy("d1").collect().toSeq
    assert(mh == exact)
  }

  test("MinHash signatures are deterministic across invocations (seeded)") {
    val s1 = Dedup.minhashSignatures(docs, "doc_id", "text").orderBy("doc_id").collect()
    val s2 = Dedup.minhashSignatures(docs, "doc_id", "text").orderBy("doc_id").collect()
    assert(s1.sameElements(s2))
  }

  test("Aggregator-based signatures are bit-identical to the expression pipeline") {
    val expr = Dedup.minhashSignatures(docs, "doc_id", "text").orderBy("doc_id")
      .collect().map(r => (1 to 64).map(r.getLong).toSeq)
    val agg = Dedup.minhashSignaturesAgg(docs, "doc_id", "text").orderBy("doc_id")
      .collect().map(_.getSeq[Long](1))
    assert(expr.toSeq == agg.toSeq)
  }

  test("SimHash: identical docs at distance 0, planted near-dups close, distinct docs far") {
    val sigs = Dedup.simhashSignatures(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(4L) == sigs(5L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(0L), sigs(1L)) < ham(sigs(0L), sigs(2L)))
    val pairs = Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxDistance = 6)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((4L, 5L)))
  }

  test("keepFirstByKey keeps the deterministic survivor") {
    val df = Seq((3L, "k1"), (1L, "k1"), (2L, "k2")).toDF("id", "k")
    val out = Dedup.keepFirstByKey(df, Seq("k"), Seq(col("id")))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "k1"), (2L, "k2")))
  }

  test("clusterAssignments: transitive chain collapses to min id, components stay apart") {
    // chain 1-2-3 (transitively one cluster) and separate pair 10-11;
    // a chain forces >1 propagation round (3 only reaches 1 via 2)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("d1", "d2")
    val out = Dedup.clusterAssignments(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("clusterAssignments fails loudly instead of returning unconverged labels") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("d1", "d2")
    assertThrows[IllegalStateException](
      Dedup.clusterAssignments(chain, maxIterations = 1).collect())
  }

  test("jaccardAgainstCorpus flags only cross-set duplicates") {
    // doc 100 duplicates corpus doc 0; doc 101 is novel
    val corpus = docs
    val fresh = Seq(
      (100L, docs.filter(col("doc_id") === 0L).head().getString(1)),
      (101L, "totally novel content with nothing shared at all here"))
      .toDF("doc_id", "text")
    val out = Dedup.jaccardAgainstCorpus(fresh, corpus, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.map(_._1).toSet == Set(100L))
    assert(out.exists(_ == (100L, 0L)))
  }

  test("containment flags an embedded benchmark item that Jaccard misses") {
    val bench = Seq((900L, "the secret benchmark question with its exact answer"))
      .toDF("doc_id", "text")
    val benchText = "the secret benchmark question with its exact answer"
    val train = Seq(
      // long page quoting the benchmark verbatim: every benchmark shingle hits
      (1L, s"lots of surrounding prose before the quote $benchText and plenty of trailing commentary after it goes on and on"),
      (2L, "entirely unrelated training document about distributed query engines"))
      .toDF("doc_id", "text")
    val scored = Dedup.contaminationAgainstCorpus(train, bench, "doc_id", "text", 3,
        minContain = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(scored((1L, 900L)) == 1.0) // verbatim quote: full coverage of the item
    assert(!scored.contains((2L, 900L))) // clean page shares no shingle: no row
    // ...while symmetric Jaccard stays below any useful dedup threshold
    val jac = Dedup.jaccardAgainstCorpus(train, bench, "doc_id", "text", 3, 0.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(jac.getOrElse(1L, 0.0) < 0.5)
  }
}
