package graft.ext

import java.math.{BigDecimal => JBig, RoundingMode}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Independent witness for the unigram-LM trainer: the DuckDB oracle
  * replays the SAME EM/Viterbi rule, so a shared rule error would
  * hash-match on both engines. This spec recomputes training with a
  * NAIVE in-memory implementation — exhaustive enumeration of every
  * segmentation, exact BigDecimal scores — and demands identical vocab
  * counts AND identical chosen paths, including tie cases. */
class UnigramWitnessSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.session
  import spark.implicits._

  private val L = 4

  private def lnp9(n: Long, tot: Long): JBig =
    new JBig(math.log(n.toDouble / tot.toDouble))
      .setScale(9, RoundingMode.HALF_UP)

  /** All segmentations of `w` into pieces from `vocab`, scored exactly. */
  private def enumerate(w: String, vocab: Map[String, JBig])
      : Seq[(JBig, Int, String)] = {
    def rec(pos: Int): Seq[(JBig, Int, List[String])] =
      if (pos == w.length) Seq((JBig.ZERO, 0, Nil))
      else (1 to math.min(L, w.length - pos)).flatMap { l =>
        val piece = w.substring(pos, pos + l)
        vocab.get(piece).toSeq.flatMap { lp =>
          rec(pos + l).map { case (s, np, ps) =>
            (s.add(lp), np + 1, piece :: ps)
          }
        }
      }
    rec(0).map { case (s, np, ps) => (s, np, ps.mkString(" ")) }
  }

  private def best(w: String, vocab: Map[String, JBig]): String = {
    val all = enumerate(w, vocab)
    assert(all.nonEmpty, s"word '$w' unsegmentable")
    // (score DESC, np ASC, path ASC) — the engine/oracle order
    all.minBy { case (s, np, p) => (s.negate, np, p) }(
      Ordering.Tuple3(Ordering.by((b: JBig) => b), Ordering.Int, Ordering.String))
      ._3
  }

  /** Naive trainer: same params as UnigramLM.train defaults. */
  private def naiveTrain(words: Map[String, Long], emIters: Int)
      : (Map[String, Long], Map[String, String]) = {
    // candidate counts: every substring occurrence weighted by word freq
    val c0 = scala.collection.mutable.Map.empty[String, Long]
    words.foreach { case (w, f) =>
      for (i <- 0 until w.length; l <- 1 to math.min(L, w.length - i))
        c0(w.substring(i, i + l)) = c0.getOrElse(w.substring(i, i + l), 0L) + f
    }
    var counts: Map[String, Long] =
      c0.toMap.filter { case (p, n) => n >= 2 || p.length == 1 }
    var paths = Map.empty[String, String]
    for (_ <- 1 to emIters) {
      val tot = counts.values.sum
      val vocab = counts.map { case (p, n) => p -> lnp9(n, tot) }
      paths = words.keys.map(w => w -> best(w, vocab)).toMap
      val next = scala.collection.mutable.Map.empty[String, Long]
      words.foreach { case (w, f) =>
        paths(w).split(' ').foreach(p => next(p) = next.getOrElse(p, 0L) + f)
      }
      counts = next.toMap
    }
    (counts, paths)
  }

  test("engine EM counts and segmentations equal the exhaustive witness") {
    // deliberate structure: shared prefixes ("spark"/"spar"/"spa"),
    // repeats, a long word, and single-occurrence words (char fallback)
    val docs = Seq(
      "spark spark spar spa table tables tab",
      "spark tab tab le le table stable",
      "q z stable tables spar le spark")
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

    val words = docs.flatMap(_.split(' ')).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    val (wantCounts, wantPaths) = naiveTrain(words, emIters = 2)

    val gotVocab = UnigramLM.train(df, "text", maxPieceLen = L,
      minCount = 2L, emIters = 2, vocabSize = Int.MaxValue)
      .collect().map(r => r.getAs[String]("piece") -> r.getAs[Long]("n")).toMap
    assert(gotVocab == wantCounts,
      s"vocab mismatch:\n got ${gotVocab.toSeq.sorted}\nwant ${wantCounts.toSeq.sorted}")

    // the apply side segments under the (untruncated) trained vocab —
    // which equals one more E-step in the witness
    val trained = UnigramLM.train(df, "text", maxPieceLen = L,
      minCount = 2L, emIters = 2, vocabSize = Int.MaxValue)
      .select("piece", "lnp")
    val gotPaths = UnigramLM.segment(df, "text", trained, maxPieceLen = L)
      .collect().map(r => r.getAs[String]("word") -> r.getAs[String]("path")).toMap
    val tot3 = wantCounts.values.sum
    val vocab3 = wantCounts.map { case (p, n) => p -> lnp9(n, tot3) }
    val wantPaths3 = words.keys.map(w => w -> best(w, vocab3)).toMap
    assert(gotPaths == wantPaths3,
      s"paths mismatch:\n got ${gotPaths.toSeq.sorted}\nwant ${wantPaths3.toSeq.sorted}")
  }

  test("tie-break determinism: equal-probability pieces resolve by (np, path)") {
    // "abab": pieces ab/ba/a/b engineered with equal counts so scores tie
    val df = Seq((0L, "abab abab baba baba")).toDF("doc_id", "text")
    val words = Map("abab" -> 2L, "baba" -> 2L)
    val (wantCounts, _) = naiveTrain(words, emIters = 2)
    val got = UnigramLM.train(df, "text", maxPieceLen = L, minCount = 2L,
      emIters = 2, vocabSize = Int.MaxValue)
      .collect().map(r => r.getAs[String]("piece") -> r.getAs[Long]("n")).toMap
    assert(got == wantCounts)
  }
}
