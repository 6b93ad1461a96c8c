package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class CurationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.session
  import spark.implicits._

  // doc 1: heavy repetition (one bigram dominates); doc 2: all-distinct
  // words; doc 3: a trigram repeated twice; doc 4: single word.
  private def docs = Seq(
    (1L, "spam ham spam ham spam ham spam ham"),
    (2L, "every word here is completely different friend"),
    (3L, "one two three pause one two three stop"),
    (4L, "solo")
  ).toDF("doc_id", "text")

  test("gopherRepetition: fractions are exact count ratios") {
    val m = Curation.gopherRepetition(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    // doc 1: 8 words, 2 distinct -> dup 6/8; bigrams: "spam ham"x4,
    // "ham spam"x3 of 7 -> top 4/7; trigrams: all 6 occurrences are of
    // grams seen >= 2 times -> dup 6/6.
    assert(m(1L) === ((8L, 6.0 / 8, 4.0 / 7, 1.0)))
    assert(m(2L) === ((7L, 0.0, 1.0 / 6, 0.0)))
    // doc 3: "one two three" twice among 6 trigrams -> dup 2/6
    assert(m(3L)._4 === 2.0 / 6)
    // doc 4: too short for any n-gram -> zeros, not nulls
    assert(m(4L) === ((1L, 0.0, 0.0, 0.0)))
  }

  test("frequentNgrams counts DISTINCT docs, not occurrences") {
    val within = Seq(
      (1L, "a b c d e x a b c d e"), // 5-gram "a b c d e" twice in ONE doc
      (2L, "unrelated text of five words plus")
    ).toDF("doc_id", "text")
    assert(Curation.frequentNgrams(within, n = 5, minDocs = 2).count() === 0)
    val across = Seq(
      (1L, "pad a b c d e pad2"),
      (2L, "other a b c d e tail")
    ).toDF("doc_id", "text")
    val rows = Curation.frequentNgrams(across, n = 5, minDocs = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows === Array(("a b c d e", 2L)))
  }

  test("scrubFrequentNgrams excises every covered token, keeps the rest in order") {
    val c = Seq(
      (1L, "intro this block is shared chrome outro"),
      (2L, "this block is shared chrome and more words"),
      (3L, "nothing common here at all five tokens")
    ).toDF("doc_id", "text")
    val out = Curation.scrubFrequentNgrams(c, n = 5, minDocs = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out(1L) === ((2L, "intro outro")))
    assert(out(2L) === ((3L, "and more words")))
    assert(out(3L) === ((7L, "nothing common here at all five tokens")))
  }

  test("scrub is row-preserving when a doc is pure boilerplate") {
    val c = Seq(
      (1L, "x y z w v"),
      (2L, "x y z w v"),
      (3L, "keep all of this text")
    ).toDF("doc_id", "text")
    val out = Curation.scrubFrequentNgrams(c, n = 5, minDocs = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out === Array((1L, 0L, ""), (2L, 0L, ""), (3L, 5L, "keep all of this text")))
  }

  test("semDedup drops exactly the higher-id member of a same-cluster near-pair") {
    // 8 near-orthogonal one-hot base vectors + one near-duplicate of vec 0
    val dim = 8
    def v(i: Int): Array[Float] = {
      val a = Array.fill(dim)(0.01f)
      a(i % dim) = 1.0f
      a
    }
    val base = (0 until dim).map(i => (i.toLong, v(i)))
    val dup = (100L, v(0).map(x => x * 0.999f)) // cosine ~1 with vec 0
    val emb = (base :+ dup).toDF("vec_id", "embedding")
    val out = Curation.semDedup(emb, tau = 0.95, k = 4)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2))).toMap
    assert(!out(100L)._2, "higher-id near-dup must be dropped")
    assert(out(0L)._2, "lower-id canonical copy must survive")
    assert(out(100L)._1 === out(0L)._1, "the pair must share a cluster for the verdict")
    assert(out.count(!_._2._2) === 1, "only the planted dup is dropped")
  }

  test("kAnonymize suppresses only sub-k quasi-identifier groups") {
    val rows = Seq(
      (1L, "en", "srcA"), (2L, "en", "srcA"), (3L, "en", "srcA"),
      (4L, "fr", "srcB")
    ).toDF("doc_id", "lang", "source")
    val out = Curation.kAnonymize(rows, Seq("lang", "source"), k = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(out(1L) === (("en", "srcA")))
    assert(out(4L) === (("*", "*")), "singleton group must be fully suppressed")
  }

  test("hardNegatives never returns a same-label neighbor and ranks by cosine") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 7),   // query, label 7
      (1L, Array(0.99f, 0.1f), 7),  // same label: most similar but EXCLUDED
      (2L, Array(0.9f, 0.3f), 8),
      (3L, Array(0.0f, 1.0f), 8)
    ).toDF("vec_id", "embedding", "label")
    val out = SimSearch.hardNegatives(emb, emb.filter($"vec_id" === 0L), k = 2)
      .orderBy("rank").collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(out === Array((1, 2L), (2, 3L)))
  }

  test("dsirWeights ranks target-vocabulary docs above off-target docs") {
    val c = Seq(
      (1L, "law court judge statute law court", "legal"),
      (2L, "statute judge ruling appeal court law", "legal"),
      (3L, "law court statute judge ruling verdict", "web"), // target-like content
      (4L, "pizza recipe cheese oven dough pizza", "web")
    ).toDF("doc_id", "text", "source")
    val w = Curation.dsirWeights(c, col("source") === "legal")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(3L) > w(4L), "legal-vocabulary web doc must outscore the pizza doc")
    assert(w(1L) > 0.0 && w(4L) < 0.0)
  }
}
