package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/**
 * Text analysis for training-data pipelines (SURVEY.md §2.3 E20): token
 * counting, quality scoring, language-ID heuristic, content fingerprints.
 * Everything is pure column expressions (codegen'd, shuffle only at the
 * final aggregations) and deterministic, so each operator oracles against
 * DuckDB running the same formula.
 */
object TextStats {

  /** Whitespace tokenization with empty-token filtering, lower-cased. */
  def tokens(textCol: Column): Column =
    filter(split(lower(textCol), " "), t => t =!= "")

  /** BPE-ish subword count estimate: whitespace tokens plus an extra unit
    * per 6 characters of long tokens (a cheap, deterministic proxy for
    * byte-pair segmentation of rare long words). */
  def tokenCountBpeIsh(textCol: Column): Column =
    // floor-then-cast so the engine and a SQL oracle using integer
    // division (`//`) agree — a bare double->int cast rounds in some
    // engines and truncates in others
    aggregate(tokens(textCol), lit(0),
      (acc, tok) => acc + lit(1) + floor(length(tok) / lit(6)).cast("int"))

  /** Corpus term frequencies: (token, n), one shuffle on token. */
  def termFrequencies(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))

  /** Per-group (e.g. per-language) term frequencies with a deterministic
    * top-k per group: one shuffle on (group, token), then a ranked window. */
  def termFrequenciesByGroup(df: DataFrame, groupCol: String, textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = df.select(col(groupCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(groupCol, "token").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(groupCol).orderBy(col("n").desc, col("token"))
    tf.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col(groupCol), col("rnk"), col("token"), col("n"))
  }

  /** Per-document quality metrics: token count, average token length,
    * stopword ratio, whitespace-token vs BPE-ish count. */
  def qualityMetrics(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val nToks = size(toks)
    // zero-token (e.g. whitespace-only) docs: ratios are null on BOTH the
    // engine and the DuckDB oracle (nullif denominator), not a /0 artifact
    val safeN = nullif(nToks, lit(0))
    val stopwords = Seq("the", "a", "of", "and", "to", "in", "is")
    val stopHits = size(filter(toks, t => t.isin(stopwords.map(s => s: Any): _*)))
    df.select(
      col(idCol),
      length(col(textCol)).as("n_chars"),
      nToks.as("n_tokens"),
      tokenCountBpeIsh(col(textCol)).as("n_tokens_bpeish"),
      (length(regexp_replace(col(textCol), " ", "")).cast(DoubleType) / safeN).as("avg_token_len"),
      (stopHits.cast(DoubleType) / safeN).as("stop_ratio"),
      (nToks.between(20, 10000) && (stopHits.cast(DoubleType) / safeN) < 0.5).as("is_quality"))
  }

  /** Language-ID by function-word evidence: count distinct-token hits per
    * language profile, argmax with a fixed priority order for ties. A
    * deterministic n-gram/stopword heuristic — not a learned model. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "nicht"),
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "de", "los", "que"),
    "fr" -> Seq("le", "les", "et", "une", "est"))

  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val distinctToks = array_distinct(tokens(col(textCol)))
    val hitCols = langProfiles.map { case (lang, words) =>
      lang -> size(array_intersect(distinctToks, array(words.map(lit): _*)))
    }
    val maxHits = greatest(hitCols.map(_._2): _*)
    // first language (alphabetical profile order) achieving the max; if no
    // profile hits at all, 'und' (undetermined)
    val predicted = hitCols.foldRight(lit("und")) { case ((lang, hits), els) =>
      when(hits === maxHits && maxHits > 0, lang).otherwise(els)
    }
    df.select(
      (col(idCol) +: hitCols.map { case (l, c) => c.as(s"hits_$l") }
        :+ predicted.as("lang_pred")): _*)
  }

  /** Content fingerprint: MD5 over the canonical token stream — identical
    * hex across engines, so exact-dup detection by fingerprint is
    * oracle-checkable. Also a 64-bit rolling hash (xxhash64-based
    * polynomial fold) for compact signatures. */
  def fingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val canonical = concat_ws(" ", tokens(col(textCol)))
    val rolling = aggregate(
      tokens(col(textCol)),
      lit(0L),
      // stays in [0, 2^31): acc*31 + 31-bit token hash, mod 2^31-1 — never
      // overflows a Long, so safe under ANSI arithmetic
      (acc, tok) => pmod(acc * lit(31L) + xxhash64(tok).bitwiseAND(lit(0x7fffffffL)), lit(2147483647L)))
    df.select(col(idCol), md5(canonical).as("fingerprint_md5"), rolling.as("fingerprint_rolling"))
  }
}
