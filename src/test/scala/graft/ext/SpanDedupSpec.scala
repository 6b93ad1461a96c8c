package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class SpanDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.session
  import spark.implicits._

  // doc 1 and doc 2 share a 5-token boilerplate block; doc 3 repeats a
  // 3-token phrase internally; doc 4 is clean; doc 5 is too short to
  // window.
  private def corpus = Seq(
    (1L, "alpha beta this license block is shared gamma delta"),
    (2L, "zeta this license block is shared eta theta iota"),
    (3L, "one two three x one two three"),
    (4L, "totally unique text with no repeats anywhere at all"),
    (5L, "too short")
  ).toDF("doc_id", "text")

  test("repeated spans: cross-doc boilerplate + within-doc repeats, canonical first exempt") {
    val spans = SpanDedup.repeatedSpans(corpus, "doc_id", "text", w = 3)
      .orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 1 holds the canonical (min doc_id) copy of the shared block ->
    // no span there; doc 2's copy ("this license block is shared" at
    // token positions 1..5) is flagged as one merged span; doc 3's second
    // "one two three" (positions 4..6) is flagged; docs 4/5 clean.
    assert(spans === Array((2L, 1L, 5L), (3L, 4L, 6L)))
  }

  test("apply keeps exactly one copy of each repeated passage corpus-wide") {
    val cleaned = SpanDedup.removeSpans(corpus, "doc_id", "text", w = 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(cleaned(1L) === "alpha beta this license block is shared gamma delta")
    assert(cleaned(2L) === "zeta eta theta iota")
    assert(cleaned(3L) === "one two three x")
    assert(cleaned(4L) === "totally unique text with no repeats anywhere at all")
    assert(cleaned(5L) === "too short") // below window width: untouched
    // the boilerplate survives exactly once across the corpus
    val copies = cleaned.values.count(_.contains("this license block is shared"))
    assert(copies === 1)
  }

  test("no unpartitioned window in the span plan (per-doc merge only)") {
    val unpartitioned = SpanDedup.repeatedSpans(corpus, "doc_id", "text", w = 3)
      .queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
      }
    assert(unpartitioned.isEmpty)
  }
}
