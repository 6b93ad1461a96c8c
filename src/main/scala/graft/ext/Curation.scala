package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/**
 * Web-corpus curation operators: the published filtering/cleanup steps a
 * large-scale LLM training-data pipeline runs between raw crawl and
 * tokenization (beyond-the-reference surface, SURVEY.md §2.4) —
 * Gopher-style repetition signals, corpus-frequent-n-gram boilerplate
 * removal (the n-gram analogue of C4's line-level dedup; the fixture's
 * documents are single-line), SemDeDup semantic near-dedup over embedding
 * clusters, and DSIR-style importance weights for data selection.
 *
 * Scale design: every operator is explode → key-partitioned aggregate →
 * re-join; nothing is all-pairs (SemDeDup's pairwise step is confined to
 * within-cluster, which is the entire point of that algorithm) and the
 * only broadcast sides are corpus-level summaries that are small by
 * construction (frequent-n-gram lists, vocabulary log-ratio tables).
 */
object Curation {

  /** Non-distinct word n-grams with their start position: (idCol, pos, gram).
    * Same named-tokens trick as [[Dedup.shingles]] (tokenize once per doc,
    * not once per shingle position). */
  private def posNgrams(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val toks = col("__toks")
    val grams = when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
      .otherwise(array())
    df.select(col(idCol), split(lower(col(textCol)), " ").as("__toks"))
      .select(col(idCol), posexplode(grams).as(Seq("pos", "gram")))
  }

  /**
   * Gopher-style intra-document repetition signals (Rae et al. 2021 §A1.1
   * "repetitious documents"), one row per document:
   *
   *   - `n_words`        token count
   *   - `dup_word_frac`  (n_words − n_distinct) / n_words
   *   - `top_bigram_frac`  occurrences of the doc's most frequent bigram
   *                        over total bigram occurrences (0 when < 2 tokens)
   *   - `dup_trigram_frac` fraction of trigram occurrences whose trigram
   *                        appears ≥ 2 times in the doc (0 when < 3 tokens)
   *
   * Determinism: every fraction is ONE IEEE division of two exact integer
   * counts — no transcendental, no rounding — so any engine computes the
   * identical double. Plan: the word stats are pure array expressions
   * (codegen, no shuffle); the two n-gram stats each shuffle once on
   * (doc, gram) then once on doc — both partial-aggregated map-side, and
   * at 100 TB the (doc, gram) key space is wide enough that no reducer is
   * hot (the heaviest key is one document's most repeated n-gram).
   */
  def gopherRepetition(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = split(lower(col(textCol)), " ")
    val words = docs.select(col(idCol), size(toks).as("n_words"),
      size(array_distinct(toks)).as("n_dist"))

    def gramStat(n: Int) = posNgrams(docs, idCol, textCol, n)
      .groupBy(col(idCol), col("gram")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol)).agg(
        max(col("c")).as("mx"),
        sum(when(col("c") >= 2, col("c")).otherwise(lit(0L))).as("dup"),
        sum(col("c")).as("tot"))

    val bi = gramStat(2).select(col(idCol),
      (col("mx").cast(DoubleType) / col("tot").cast(DoubleType)).as("top_bigram_frac"))
    val tri = gramStat(3).select(col(idCol),
      (col("dup").cast(DoubleType) / col("tot").cast(DoubleType)).as("dup_trigram_frac"))

    words
      .join(bi, Seq(idCol), "left")
      .join(tri, Seq(idCol), "left")
      .select(col(idCol), col("n_words").cast("long").as("n_words"),
        ((col("n_words") - col("n_dist")).cast(DoubleType) /
          col("n_words").cast(DoubleType)).as("dup_word_frac"),
        coalesce(col("top_bigram_frac"), lit(0.0)).as("top_bigram_frac"),
        coalesce(col("dup_trigram_frac"), lit(0.0)).as("dup_trigram_frac"))
  }

  /** Corpus-frequent word n-grams: every n-gram appearing in ≥ `minDocs`
    * DISTINCT documents, with its document frequency. The boilerplate
    * dictionary [[scrubFrequentNgrams]] subtracts — small by construction
    * (bounded by true boilerplate, not corpus size), so downstream it
    * travels as a broadcast. One shuffle on the gram after an exact
    * per-partition (gram, doc) distinct. */
  def frequentNgrams(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 5, minDocs: Int = 2): DataFrame =
    posNgrams(docs, idCol, textCol, n)
      .select(col(idCol), col("gram")).distinct()
      .groupBy("gram").agg(count(lit(1)).as("doc_freq"))
      .filter(col("doc_freq") >= minDocs)

  /**
   * Boilerplate scrub: delete every token covered by an occurrence of a
   * corpus-frequent n-gram (the single-line analogue of C4/RefinedWeb
   * line-level dedup — a span shared verbatim across ≥ `minDocs` documents
   * is navigation chrome / licence text, not content). Returns one row per
   * input document: (idCol, n_kept, text_clean), text_clean preserving
   * original token order with covered spans excised.
   *
   * Plan: the frequent-gram dictionary (small) broadcasts onto the
   * positional n-gram stream; covered positions explode from matched
   * starts; the kept-token reassembly is one (doc) aggregate over a
   * left-anti join on (doc, pos). Nothing shuffles the corpus more than
   * the two doc-keyed exchanges, and both partial-aggregate.
   */
  def scrubFrequentNgrams(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 5, minDocs: Int = 2): DataFrame = {
    val freq = broadcast(frequentNgrams(docs, idCol, textCol, n, minDocs)
      .select(col("gram")))
    val covered = posNgrams(docs, idCol, textCol, n)
      .join(freq, "gram")
      .select(col(idCol), explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("pos"))
      .distinct()
    val toks = docs
      .select(col(idCol), posexplode(split(lower(col(textCol)), " ")).as(Seq("pos", "tok")))
    val kept = toks.join(covered, Seq(idCol, "pos"), "left_anti")
      .groupBy(col(idCol)).agg(
        count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok"))).as("text_clean"))
    // a fully-boilerplate document keeps zero tokens: re-seat it from the
    // corpus spine so the operator is row-preserving
    docs.select(col(idCol)).join(kept, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }

  /**
   * SemDeDup (Abbas et al. 2023): semantic near-dedup by clustering the
   * embedding space (reusing [[SimSearch.ivfAssign]]'s deterministic
   * k-means) and keeping, per duplicate pair within a cluster, only the
   * lower-id vector. Output: (vec_id, cluster, keep) for every input
   * vector — keep=false iff some lower-id vector in the same cluster has
   * cosine ≥ `tau`.
   *
   * This is the algorithm whose entire purpose is 100 TB shape: the
   * pairwise cosine is confined to within-cluster (corpus²/k work instead
   * of corpus², and embarrassingly parallel across clusters); clusters are
   * the shuffle key. Skew guard: a pathological giant cluster is the
   * k-means failure mode, not the join's — production would cap cluster
   * size by re-splitting (k on the oversized cluster), which composes from
   * this same operator.
   */
  def semDedup(embeddings: DataFrame, tau: Double, k: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val assigned = graft.ops.BoundedCache.cached(
      SimSearch.ivfAssign(embeddings, k, idCol, vecCol)
        .withColumn("nrm", sqrt(graft.functions.VectorFunctions.vecDotExpr("v", "v"))))
    val a = assigned.select(col("cluster"), col("id").as("ida"),
      col("v").as("va"), col("nrm").as("na"))
    val b = assigned.select(col("cluster"), col("id").as("idb"),
      col("v").as("vb"), col("nrm").as("nb"))
    val dropped = a.join(b, Seq("cluster"))
      .filter(col("ida") < col("idb"))
      .filter(graft.functions.VectorFunctions.vecDotExpr("va", "vb")
        / (col("na") * col("nb")) >= tau)
      .select(col("idb").as("id")).distinct()
    assigned.join(dropped.withColumn("__drop", lit(true)), Seq("id"), "left")
      .select(col("id").as(idCol), col("cluster"),
        coalesce(col("__drop"), lit(false)).unary_!.as("keep"))
  }

  /**
   * k-anonymity suppression over quasi-identifier columns (the governance
   * pass a shared training corpus runs before release): any combination of
   * `quasiCols` values carried by fewer than `k` rows is suppressed to
   * `"*"` — no surviving quasi-identifier combination isolates fewer than
   * `k` individuals. Non-quasi columns pass through untouched.
   *
   * Plan: one partial-aggregated groupBy over the quasi columns (group
   * cardinality, not row count — small), broadcast back onto the corpus;
   * the corpus itself never shuffles.
   */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    val counts = df.groupBy(quasiCols.map(col): _*).agg(count(lit(1)).as("__n"))
    df.join(broadcast(counts), quasiCols)
      .select(df.columns.map { c =>
        if (quasiCols.contains(c))
          when(col("__n") >= k, col(c)).otherwise(lit("*")).as(c)
        else col(c)
      }.toSeq: _*)
  }

  /**
   * DSIR-style importance weights (Xie et al. 2023, reduced to exact
   * unigram form): per-document mean log-likelihood ratio between a target
   * distribution (the documents of `targetFilter`) and the whole corpus,
   * add-1 smoothed over the corpus vocabulary. Positive ⇒ the document
   * looks more like the target domain than the average corpus document —
   * the resampling weight data-selection pipelines gate on.
   *
   * Determinism: each vocabulary word's log-ratio is ONE `ln` of a
   * double ratio, rounded 9 dp (the repo's transcendental-portability
   * contract, cf. [[TextStats.tfidf]]); the per-doc sum of rounded terms
   * is an exact DECIMAL sum; the final per-token mean is one IEEE
   * division. Plan: token counts are two corpus aggregates; the log-ratio
   * table is vocabulary-sized (small) and broadcasts onto the per-doc
   * token stream; one doc-keyed aggregate ends it.
   */
  def dsirWeights(docs: DataFrame, targetFilter: org.apache.spark.sql.Column,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol), targetFilter.as("is_target"),
      explode(split(lower(col(textCol)), " ")).as("tok"))
    val counts = graft.ops.BoundedCache.cached(
      toks.groupBy("tok").agg(
        sum(when(col("is_target"), 1L).otherwise(0L)).as("ct"),
        count(lit(1)).as("cc")))
    val totals = counts.agg(
      sum(col("ct")).as("nt"), sum(col("cc")).as("nc"),
      count(lit(1)).as("vocab"))
    val ratios = counts.join(broadcast(totals), lit(true))
      .select(col("tok"), round(log(
        ((col("ct") + lit(1L)).cast(DoubleType) * (col("nc") + col("vocab")).cast(DoubleType))
          / ((col("cc") + lit(1L)).cast(DoubleType) * (col("nt") + col("vocab")).cast(DoubleType))), 9)
        .as("lr"))
    toks.join(broadcast(ratios), "tok")
      .groupBy(col(idCol)).agg(
        count(lit(1)).as("n_tokens"),
        (sum(col("lr").cast(DecimalType(28, 12))).cast(DoubleType)
          / count(lit(1)).cast(DoubleType)).as("dsir_weight"))
  }

  /**
   * Cross-source n-gram containment matrix — the corpus-governance census
   * behind source-level dedup and contamination triage: for every ordered
   * pair of sources (a, b), what fraction of a's distinct n-grams also
   * appear somewhere in b? High containment of a benchmark-ish source in a
   * crawl source means leakage; near-total mutual containment means two
   * ingest feeds crawled the same site and one should be dropped wholesale
   * (cheaper than doc-level dedup of their union).
   *
   * Output: (src_a, src_b, grams_a, shared, containment) for pairs with
   * shared ≥ 1, src_a ≠ b.
   *
   * Scale shape: the pair join is keyed on the GRAM, and each gram
   * contributes at most |sources|² pair rows after a per-gram DISTINCT
   * source projection — so shuffle is Σ_gram df_src², bounded by
   * |grams| × |sources|², with |sources| a catalog-sized constant (tens
   * to thousands). Nothing is ever documents²; the corpus is scanned
   * once. The per-source gram universe sizes reduce from the same
   * distinct projection.
   */
  def sourceOverlap(docs: DataFrame, srcCol: String = "source",
      textCol: String = "text", n: Int = 5): DataFrame = {
    val srcGrams = graft.ops.BoundedCache.cached(
      posNgrams(docs, srcCol, textCol, n)
        .select(col(srcCol).as("src"), col("gram")).distinct())
    val sizes = srcGrams.groupBy("src").agg(count(lit(1)).as("grams"))
    val shared = srcGrams.select(col("src").as("src_a"), col("gram"))
      .join(srcGrams.select(col("src").as("src_b"), col("gram")), "gram")
      .filter(col("src_a") =!= col("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.select(col("src").as("src_a"), col("grams").as("grams_a")), "src_a")
      .withColumn("containment",
        col("shared").cast(DoubleType) / col("grams_a").cast(DoubleType))
      .select("src_a", "src_b", "grams_a", "shared", "containment")
  }
}
