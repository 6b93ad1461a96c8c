package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.SparkTestBase

class TextStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.session
  import spark.implicits._

  val docs = Seq(
    (0L, "the quick  brown fox and the lazy dog"), // double space -> empty token filtered
    (1L, "der schnelle braune fuchs und der hund"),
    (2L, "extraordinarily long agglutinative wordform"))
    .toDF("doc_id", "text")

  test("term frequencies count tokens with multiplicity, empties filtered") {
    val tf = TextStats.termFrequencies(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tf("the") == 2L)
    assert(tf("der") == 2L)
    assert(tf("fox") == 1L)
    assert(!tf.contains(""))
  }

  test("quality metrics: counts, ratios, BPE-ish estimate") {
    val m = TextStats.qualityMetrics(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val r0 = m(0)
    assert(r0.getInt(2) == 8)                      // n_tokens
    assert(r0.getDouble(5) == 3.0 / 8)             // stop_ratio: the,and,the
    assert(!r0.getBoolean(6))                      // < 20 tokens -> not quality
    val r2 = m(2)
    // 4 tokens + floor(15/6)+floor(4/6)+floor(13/6)+floor(8/6) = 4+2+0+2+1
    assert(r2.getInt(3) == 9)                      // n_tokens_bpeish
  }

  test("quality metrics on a zero-token doc: null ratios, zero counts, not-quality") {
    val empty = Seq((9L, "   ")).toDF("doc_id", "text")
    val r = TextStats.qualityMetrics(empty, "doc_id", "text").collect().head
    assert(r.getInt(2) == 0)      // n_tokens
    assert(r.getInt(3) == 0)      // n_tokens_bpeish: 0 tokens -> 0 units
    assert(r.isNullAt(4))         // avg_token_len guarded, not /0
    assert(r.isNullAt(5))         // stop_ratio guarded
    assert(!r.getBoolean(6))      // is_quality: false, not null
  }

  test("tfidf: corpus-wide tokens get low idf, rare tokens score high") {
    val out = TextStats.tfidf(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(5)))
    val byTok = out.groupBy(_._2)
    // 'der' appears twice in doc 1 only: tf=2, df=1
    val der = byTok("der").head
    assert(der._3 == 2L && der._4 == 1L)
    // idf monotonicity: token in 1 doc scores higher than token in 2+ docs
    val fox = byTok("fox").head   // df counts docs, not occurrences
    assert(fox._4 == 1L)
  }

  test("qualityFilter drops short, shouty, and stopword-free docs") {
    val mixed = Seq(
      (1L, "the quick brown fox and the lazy dog went to the market in town and " +
        "bought a basket of fresh bread and fruit for the long trip home again"),
      (2L, "short"),
      (3L, "THE QUICK BROWN FOX AND THE LAZY DOG WENT TO THE MARKET IN TOWN AND " +
        "BOUGHT A BASKET OF FRESH BREAD AND FRUIT FOR THE LONG TRIP HOME AGAIN"))
      .toDF("doc_id", "text")
    val kept = TextStats.qualityFilter(mixed, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L))
  }

  test("scrubPii redacts emails, IPv4s, and long digit runs, leaves prose alone") {
    val df = Seq((1L, "mail bob.smith+x@corp.example.org or call 08001234567 from 192.168.0.1 tomorrow"))
      .toDF("id", "text")
    val out = df.select(TextStats.scrubPii(col("text"))).head().getString(0)
    assert(out == "mail <EMAIL> or call <NUM> from <IP> tomorrow")
  }

  test("langId picks the profile with most function-word hits, deterministic ties") {
    val out = TextStats.langId(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.getString(5))
    assert(out(0) == "en")
    assert(out(1) == "de")
    assert(out(2) == "und") // no profile hits
  }

  test("fingerprints: identical normalized token streams collide, others don't") {
    val d = Seq(
      (0L, "hello  world"), (1L, "hello world"), (2L, "hello there"))
      .toDF("doc_id", "text")
    val fp = TextStats.fingerprints(d, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(fp(0).getString(1) == fp(1).getString(1)) // md5 equal after canonicalization
    assert(fp(0).getString(1) != fp(2).getString(1))
    assert(fp(0).getLong(2) == fp(1).getLong(2))     // rolling hash agrees
    assert(fp(0).getLong(2) != fp(2).getLong(2))
  }

  test("bpeMergeStep: greedy left-to-right overlap semantics on identical-token runs") {
    // (a,a) is the most frequent adjacent pair; runs of a exercise the
    // overlapping-start case where greedy order matters
    val d = Seq(
      (0L, "a a a a b"),   // -> aa aa b
      (1L, "a a a"),       // -> aa a   (position 2 left unmerged)
      (2L, "b a a b"),     // -> b aa b
      (3L, "x y"))         // untouched
      .toDF("doc_id", "text")
    val got = TextStats.bpeMergeStep(d, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getString(5)))
    assert(got.forall(r => r._2 == "a" && r._3 == "a"))
    assert(got.map(r => (r._1, r._4, r._5, r._6)).toSeq === Seq(
      (0L, 5L, 3L, "aa aa b"),
      (1L, 3L, 2L, "aa a"),
      (2L, 4L, 3L, "b aa b"),
      (3L, 2L, 2L, "x y")))
  }

  test("bigramLmScore: common word sequences outrank improbable ones; <2-token docs drop") {
    val d = Seq(
      (0L, "the cat sat"), (1L, "the cat sat"), (2L, "the cat sat"),
      (3L, "sat cat the"),  // same tokens, unseen transitions
      (4L, "single"))       // no bigrams -> absent from output
      .toDF("doc_id", "text")
    val got = TextStats.bigramLmScore(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
      .sortBy(_._1)
    assert(got.map(_._1) === List(0L, 1L, 2L, 3L))
    assert(got.forall(_._2 == 2))               // two bigrams per doc
    assert(got(0)._3 == got(1)._3)              // identical docs, identical score
    assert(got(0)._3 > got(3)._3)               // frequent transitions more probable
  }

  test("sparseCosinePairs: identical docs hit 1.0, token-disjoint docs never pair") {
    val d = Seq(
      (0L, "alpha beta gamma"), (1L, "alpha beta gamma"),
      (2L, "delta epsilon zeta"), (3L, "alpha beta delta"))
      .toDF("doc_id", "text")
    val got = TextStats.sparseCosinePairs(d, "doc_id", "text",
        maxDf = 100, minSim = 0.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // identical vectors: 1.0 within one ulp (the quotient is served
    // unrounded — sqrt introduces the last-place wobble)
    assert(math.abs(got((0L, 1L)) - 1.0) < 1e-12)
    assert(!got.contains((0L, 2L)))            // no shared token, no pair
    assert(got.keys.forall { case (a, b) => a < b }) // oriented, no mirror dupes
    assert(got((0L, 3L)) > 0 && got((0L, 3L)) < 1.0)
  }
}
