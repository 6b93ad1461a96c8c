package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Independent witness for the BPE merge semantics: the DuckDB oracle
  * REPLAYS the same islands-window rule as the engine, so a shared rule
  * error would hash-match on both engines. This spec recomputes training
  * with a NAIVE sequential tokenizer (the textbook greedy left-to-right
  * scan) and demands identical merges and identical final sequences —
  * including the w1=w2 overlap runs where greedy-vs-windowed differ if
  * the islands rule is wrong. */
class BpeWitnessSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.session
  import spark.implicits._

  /** Textbook sequential BPE: top pair by (count desc, w1, w2), then one
    * greedy left-to-right non-overlapping merge pass per doc. */
  private def naiveTrain(docs: Seq[Seq[String]], n: Int)
      : (Seq[(String, String, Long)], Seq[Seq[String]]) = {
    var seqs = docs
    val merges = Seq.newBuilder[(String, String, Long)]
    for (_ <- 1 to n) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      seqs.foreach { ts =>
        ts.zip(ts.drop(1)).foreach(p => counts(p) = counts.getOrElse(p, 0L) + 1)
      }
      if (counts.nonEmpty) {
        val ((w1, w2), cnt) = counts.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.head
        merges += ((w1, w2, cnt))
        seqs = seqs.map { ts =>
          val out = Seq.newBuilder[String]
          var i = 0
          while (i < ts.length) {
            if (i + 1 < ts.length && ts(i) == w1 && ts(i + 1) == w2) {
              out += (w1 + w2); i += 2 // greedy: consume both, no overlap
            } else { out += ts(i); i += 1 }
          }
          out.result()
        }
      }
    }
    (merges.result(), seqs)
  }

  private def engineTrain(docs: Seq[Seq[String]], n: Int)
      : (Seq[(String, String, Long)], Seq[Seq[String]]) = {
    val df = docs.zipWithIndex
      .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
      .toDF("doc_id", "text")
    val (merges, seq) = TextStats.bpeTrainFull(df, "doc_id", "text", n)
    val m = merges.orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val finals = seq.orderBy("id", "p").collect()
      .map(r => (r.getLong(0), r.getString(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    (m, docs.indices.map(i => finals.getOrElse(i.toLong, Seq.empty)))
  }

  /** Sequential witness for the BATCHED round rule: rank pair counts by
    * (count desc, w1, w2), take the top-k candidates, thin to the
    * rank-dominant token-disjoint subset (survive iff no higher-ranked
    * CANDIDATE shares a token), then ONE greedy left-to-right scan that
    * merges any position starting a surviving pair — token-disjointness
    * makes the simultaneous application unambiguous. */
  private def naiveBatched(docs: Seq[Seq[String]], rounds: Int, k: Int)
      : (Seq[(String, String, Long)], Seq[Seq[String]]) = {
    var seqs = docs
    val merges = Seq.newBuilder[(String, String, Long)]
    for (_ <- 1 to rounds) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      seqs.foreach { ts =>
        ts.zip(ts.drop(1)).foreach(p => counts(p) = counts.getOrElse(p, 0L) + 1)
      }
      if (counts.nonEmpty) {
        val ranked = counts.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.take(k)
        val sel = ranked.zipWithIndex.filter { case (((w1, w2), _), i) =>
          !ranked.take(i).exists { case ((v1, v2), _) =>
            v1 == w1 || v1 == w2 || v2 == w1 || v2 == w2 }
        }.map(_._1)
        merges ++= sel.map { case ((w1, w2), c) => (w1, w2, c) }
        val selSet = sel.map(_._1).toSet
        seqs = seqs.map { ts =>
          val out = Seq.newBuilder[String]
          var i = 0
          while (i < ts.length) {
            if (i + 1 < ts.length && selSet.contains((ts(i), ts(i + 1)))) {
              out += (ts(i) + ts(i + 1)); i += 2
            } else { out += ts(i); i += 1 }
          }
          out.result()
        }
      }
    }
    (merges.result(), seqs)
  }

  private def engineBatched(docs: Seq[Seq[String]], rounds: Int, k: Int)
      : (Seq[(String, String, Long)], Seq[Seq[String]]) = {
    val df = docs.zipWithIndex
      .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
      .toDF("doc_id", "text")
    val (merges, seq) = TextStats.bpeTrainBatched(df, "doc_id", "text", rounds, k)
    val m = merges.orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val finals = seq.orderBy("id", "p").collect()
      .map(r => (r.getLong(0), r.getString(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    (m, docs.indices.map(i => finals.getOrElse(i.toLong, Seq.empty)))
  }

  test("engine BPE == textbook sequential BPE on adversarial overlap corpora") {
    val corpora = Seq(
      // the overlap trap: runs of the same token (w1 = w2)
      Seq(Seq("a", "a", "a", "a", "a"), Seq("a", "a", "a")),
      // alternating pair chains
      Seq(Seq("x", "y", "x", "y", "x", "y"), Seq("y", "x", "y", "x")),
      // tie-breaking between equal-count pairs (lexicographic)
      Seq(Seq("b", "c", "b", "c"), Seq("a", "d", "a", "d")),
      // merged token immediately re-pairs on the next step
      Seq(Seq("p", "q", "r", "p", "q", "r", "p", "q")),
      // mixed lengths incl. empty and single-token docs
      Seq(Seq.empty, Seq("z"), Seq("m", "n"), Seq("m", "n", "m", "n", "m")))
    corpora.zipWithIndex.foreach { case (docs, ci) =>
      for (n <- 1 to 3) {
        val (nm, ns) = naiveTrain(docs, n)
        val (em, es) = engineTrain(docs, n)
        assert(em === nm, s"corpus $ci, $n merges: merge tables differ")
        assert(es === ns, s"corpus $ci, $n merges: final sequences differ")
      }
    }
  }

  test("random corpora: engine and textbook trainers agree end-to-end") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "d")
    for (trial <- 1 to 5) {
      val docs = Seq.fill(4)(
        Seq.fill(3 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))))
      val (nm, ns) = naiveTrain(docs, 4)
      val (em, es) = engineTrain(docs, 4)
      assert(em === nm, s"trial $trial merges differ: engine=$em naive=$nm docs=$docs")
      assert(es === ns, s"trial $trial sequences differ: docs=$docs")
    }
  }

  test("batched BPE with batchK=1 degenerates to exactly classic sequential BPE") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c")
    for (trial <- 1 to 3) {
      val docs = Seq.fill(3)(
        Seq.fill(4 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))))
      val (nm, ns) = naiveTrain(docs, 3)
      val (bm, bs) = naiveBatched(docs, 3, 1)
      assert(bm === nm && bs === ns, s"trial $trial: k=1 witness != classic witness")
      val (em, es) = engineBatched(docs, 3, 1)
      assert(em === nm, s"trial $trial: engine k=1 merges differ")
      assert(es === ns, s"trial $trial: engine k=1 sequences differ")
    }
  }

  test("batched BPE == sequential batched witness on adversarial corpora") {
    val corpora = Seq(
      // conflicting candidates: (a,b) and (b,c) share b — dominance must
      // drop the lower-ranked one; (d,e) disjoint, merges same round
      Seq(Seq("a", "b", "c", "a", "b", "d", "e"), Seq("d", "e", "a", "b", "c")),
      // same-token run pairs inside a batch: (a,a) plus disjoint (x,y)
      Seq(Seq("a", "a", "a", "a", "x", "y"), Seq("x", "y", "a", "a", "a")),
      // adjacent different-pair starts: selected pairs tile the doc
      Seq(Seq("p", "q", "r", "s", "p", "q", "r", "s", "p", "q")),
      // merged token re-pairs next ROUND (cross-round dependency)
      Seq(Seq("m", "n", "o", "m", "n", "o", "m", "n", "o")),
      // empties and singletons
      Seq(Seq.empty, Seq("z"), Seq("u", "v", "u", "v", "u", "v")))
    corpora.zipWithIndex.foreach { case (docs, ci) =>
      for ((rounds, k) <- Seq((1, 3), (2, 3), (3, 8))) {
        val (nm, ns) = naiveBatched(docs, rounds, k)
        val (em, es) = engineBatched(docs, rounds, k)
        assert(em === nm, s"corpus $ci rounds=$rounds k=$k: merges differ " +
          s"engine=$em naive=$nm")
        assert(es === ns, s"corpus $ci rounds=$rounds k=$k: sequences differ")
      }
    }
  }

  test("random corpora: batched engine and batched witness agree end-to-end") {
    val rnd = new scala.util.Random(1234)
    val vocab = Vector("a", "b", "c", "d", "e")
    for (trial <- 1 to 5) {
      val docs = Seq.fill(5)(
        Seq.fill(5 + rnd.nextInt(15))(vocab(rnd.nextInt(vocab.size))))
      val (nm, ns) = naiveBatched(docs, 3, 4)
      val (em, es) = engineBatched(docs, 3, 4)
      assert(em === nm, s"trial $trial merges differ: engine=$em naive=$nm docs=$docs")
      assert(es === ns, s"trial $trial sequences differ: docs=$docs")
    }
  }
}
