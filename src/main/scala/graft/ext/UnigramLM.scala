package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Unigram-language-model tokenizer training (the SentencePiece unigram
 * algorithm's EM core, Kudo 2018) — the second tokenizer family next to
 * [[TextStats.bpeTrainBatched]]:
 *
 *  1. candidate vocabulary = every substring of every corpus word up to
 *     `maxPieceLen` chars with corpus count ≥ `minCount`, plus ALL
 *     single characters (segmentation coverage guarantee);
 *  2. EM rounds: the E-step Viterbi-segments each DISTINCT word under
 *     the current piece log-probabilities and weights the chosen pieces
 *     by corpus word frequency; the M-step re-estimates `p(piece) =
 *     count / total` from those counts and drops unused pieces;
 *  3. output = the `vocabSize` highest-count pieces with their final
 *     log-probabilities.
 *
 * Determinism contract (the whole point of the implementation): piece
 * log-probs are 9-dp-rounded (`round(ln(n/total), 9)` — the repo's ln
 * contract) and then carried as DECIMAL(28,9), so Viterbi path scores
 * are EXACT decimal sums and every DP comparison is exact; ties break
 * by (fewer pieces, then lexicographic path). Prefix-optimality holds
 * for that order (scores and piece counts are additive; equal-score
 * equal-count paths over the same prefix have equal length, so the
 * lexicographic comparison is decided inside the prefix), which makes
 * the distributed per-position DP here provably equal to the DuckDB
 * oracle's exhaustive-enumeration recursive CTE.
 *
 * Scale shape: the corpus-proportional work is ONE tokenize+count pass
 * (`words`); everything after runs on DISTINCT words — candidate
 * explode, edge join, and a per-position DP loop of `max word length`
 * rounds (each a word-keyed shuffle, frame checkpointed per round).
 * Driver sees two bounded scalars (max word length, loop indices),
 * never data. Words longer than `maxWordLen` are excluded up front
 * (SentencePiece's max-piece-length pragmatics applied at the word
 * level) so the DP depth is bounded by a constant, not by the corpus.
 */
object UnigramLM {

  private val Dec = DecimalType(28, 9)

  /** (piece, n, lnp DECIMAL(28,9)) with `lnp = round(ln(n/total), 9)`. */
  private def withLnp(counts: DataFrame): DataFrame = {
    val tot = counts.agg(sum(col("n")).as("__tot"))
    counts.crossJoin(broadcast(tot))
      .withColumn("lnp",
        round(log(col("n").cast("double") / col("__tot").cast("double")), 9)
          .cast(Dec))
      .drop("__tot")
  }

  /** Distinct corpus words with frequencies (the one data-∝ pass). */
  private def wordCounts(df: DataFrame, textCol: String, maxWordLen: Int): DataFrame =
    df.select(explode(TextStats.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) <= maxWordLen)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Viterbi-best segmentation of every word under `vocab` (piece, lnp):
    * returns (word, path, score, np) — path is the space-joined piece
    * sequence, the unique DP optimum under (score desc, np asc, path
    * asc).
    *
    * Round 13 (optimization): the DP runs PER ROW over the word's
    * collected edge list with `aggregate` higher-order functions — one
    * shuffle (the collect_list groupBy) instead of the previous
    * `maxLen`-round driver loop (a join + window + localCheckpoint PER
    * CHARACTER POSITION: ~24 shuffle rounds and ~24 actions per call,
    * ×3 calls in q_unigram_segment). A word is ≤ `maxWordLen` chars with
    * ≤ `maxWordLen`·`maxPieceLen` vocab edges, so the per-row DP is a
    * bounded local loop — exactly the state the old rounds shuffled.
    * Scores stay DECIMAL(28,9) with the same per-step cast, and the
    * candidate fold's (score desc, np asc, path asc) comparison is a
    * total order (distinct candidates at a position always differ in
    * path), so the result is the identical unique optimum regardless of
    * edge collection order. */
  private def viterbi(words: DataFrame, vocab: DataFrame,
      maxPieceLen: Int): DataFrame = {
    val L = maxPieceLen
    val edges = words.select(col("word"),
        explode(expr(
          s"""flatten(transform(sequence(0, length(word)-1), i ->
             |  transform(sequence(i+1, least(i+$L, length(word))), j ->
             |    named_struct('i', i, 'j', j))))""".stripMargin)).as("e"))
      .select(col("word"), col("e.i").as("i"), col("e.j").as("j"),
        expr("substring(word, e.i + 1, e.j - e.i)").as("piece"))
      .join(vocab.select("piece", "lnp"), "piece")
    val st = "struct<score:decimal(28,9),np:int,path:string>"
    // acc[k] = best state at position k (subscript is 0-based), NULL if
    // unreachable; candidates extend acc[e.i] over edge (i, j] at step j
    val dp =
      s"""element_at(
         |  aggregate(
         |    sequence(1, length(word)),
         |    array(named_struct(
         |      'score', CAST(0 AS DECIMAL(28,9)), 'np', 0, 'path', '')),
         |    (acc, j) -> concat(acc, array(
         |      aggregate(
         |        transform(
         |          filter(es, e -> e.j = j AND acc[e.i] IS NOT NULL),
         |          e -> named_struct(
         |            'score', CAST(acc[e.i].score + e.lnp AS DECIMAL(28,9)),
         |            'np', acc[e.i].np + 1,
         |            'path', CASE WHEN acc[e.i].path = '' THEN e.piece
         |              ELSE concat(acc[e.i].path, ' ', e.piece) END)),
         |        CAST(NULL AS $st),
         |        (b, c) -> CASE
         |          WHEN b IS NULL THEN c
         |          WHEN c.score > b.score THEN c
         |          WHEN c.score = b.score AND c.np < b.np THEN c
         |          WHEN c.score = b.score AND c.np = b.np AND c.path < b.path
         |            THEN c
         |          ELSE b END)))),
         |  length(word) + 1)""".stripMargin
    edges.groupBy("word")
      .agg(collect_list(struct(col("i"), col("j"), col("piece"), col("lnp")))
        .as("es"))
      .withColumn("__best", expr(dp))
      .filter(col("__best").isNotNull)
      .select(col("word"), col("__best.path").as("path"),
        col("__best.score").as("score"), col("__best.np").as("np"))
  }

  /** Train the unigram LM; returns `(token_id, piece, n, lnp)` — the
    * `vocabSize` top pieces by (final EM count desc, piece asc), with
    * `lnp` as the 9-dp-rounded double log-probability. */
  def train(df: DataFrame, textCol: String, maxPieceLen: Int = 4,
      minCount: Long = 2L, emIters: Int = 2, vocabSize: Int = 200,
      maxWordLen: Int = 24): DataFrame = {
    require(emIters >= 1 && vocabSize >= 1 && maxPieceLen >= 1)
    val words = wordCounts(df, textCol, maxWordLen).localCheckpoint(true)
    require(!words.isEmpty, "empty corpus")
    val L = maxPieceLen

    // candidate vocab: substring counts weighted by word frequency
    val cand = words.select(col("freq"),
      explode(expr(
        s"""flatten(transform(sequence(0, length(word)-1), i ->
           |  transform(sequence(1, least($L, length(word)-i)), l ->
           |    substring(word, i+1, l))))""".stripMargin)).as("piece"))
    var vocab = withLnp(
      cand.groupBy("piece").agg(sum(col("freq")).as("n"))
        .filter(col("n") >= minCount || length(col("piece")) === 1))
      .localCheckpoint(true)

    var counts: DataFrame = null
    for (_ <- 1 to emIters) {
      val seg = viterbi(words, vocab, L)
      counts = seg.join(words.select("word", "freq"), "word")
        .select(col("freq"), explode(split(col("path"), " ")).as("piece"))
        .groupBy("piece").agg(sum(col("freq")).as("n"))
      vocab = withLnp(counts).localCheckpoint(true)
    }

    val tot = counts.agg(sum(col("n")).as("__tot"))
    val scored = counts.crossJoin(broadcast(tot))
      .withColumn("lnp",
        round(log(col("n").cast("double") / col("__tot").cast("double")), 9))
      .drop("__tot")
    // vocab ranking through the distributed rank idiom (VERDICT r7
    // item 6): the frame is vocab-bounded by construction (pieces ≤
    // maxPieceLen chars), but routing it through PrefixSum.rankDesc
    // keeps the repo-wide "no unpartitioned window" invariant
    // assertable by plan inspection instead of by argument
    graft.ops.PrefixSum.rankDesc(scored, "n", Seq("piece"), "__rank")
      .withColumn("token_id", (col("__rank") - 1).cast("int"))
      .drop("__rank")
      .filter(col("token_id") < vocabSize)
      .select("token_id", "piece", "n", "lnp")
  }

  /** Apply side: Viterbi-segment the corpus's distinct words under a
    * TRAINED vocab (piece, lnp double) — returns (word, freq, path,
    * n_pieces). The DP score stays internal (exact decimal): emitting it
    * would force a DECIMAL(28,9)→DOUBLE cast, DuckDB's one
    * known-incorrectly-rounded conversion (see the verify-skill notes). */
  def segment(df: DataFrame, textCol: String, vocab: DataFrame,
      maxPieceLen: Int = 4, maxWordLen: Int = 24): DataFrame = {
    val words = wordCounts(df, textCol, maxWordLen).localCheckpoint(true)
    require(!words.isEmpty, "empty corpus")
    val v = vocab.select(col("piece"), col("lnp").cast(Dec).as("lnp"))
    viterbi(words, v, maxPieceLen)
      .join(words, "word")
      .select(col("word"), col("freq"), col("path"), col("np").as("n_pieces"))
  }
}
