package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

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

  /**
   * BM25 relevance scoring of every document against the corpus's own
   * `topTerms` most frequent tokens (a deterministic, data-derived query —
   * no fixture assumptions). Classic Okapi form per (doc, term):
   *
   *   idf(t)·tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
   *   idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))
   *
   * summed over matched terms and rounded 9 dp. Plan shape: one
   * (doc, token) aggregate for tf, a token-group aggregate for df, the
   * tiny query-term frame broadcast onto the tf rows, scalar corpus
   * stats (N, avgdl from exact integer sums) via a 1-row broadcast cross
   * join — the per-doc scoring never shuffles the corpus again.
   */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      k1: Double = 1.2, b: Double = 0.75, topTerms: Int = 3): DataFrame = {
    // the (doc, token) aggregate feeds df, the query-term ranking, AND the
    // final scoring join — bounded-cache it so the tokenize+aggregate pass
    // runs once (same pattern as tfidf below)
    val tf = graft.ops.BoundedCache.cached(docs
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf")))
    val dl = docs.select(col(idCol), size(tokens(col(textCol))).as("dl"))
    val corpus = dl.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast(DoubleType) / count(lit(1))).as("avgdl"))
    // global term count derives from tf — no second corpus tokenization
    val query = tf.groupBy("token")
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("n"))
      .orderBy(col("n").desc, col("token")).limit(topTerms)
      .select("token", "df")
    tf.join(broadcast(query), "token")
      .join(dl, idCol)
      .crossJoin(broadcast(corpus))
      .withColumn("__idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("__s",
        col("__idf") * col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col(idCol))
      .agg(round(sum(col("__s").cast(DecimalType(28, 12))).cast(DoubleType), 9).as("bm25"))
  }

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

  /**
   * Vocabulary construction: the `maxSize` most frequent tokens above
   * `minCount` (ties broken lexicographically) with dense contiguous ids
   * in frequency-rank order. The top-k runs as a distributed heap
   * (`TakeOrderedAndProject` — per-partition heaps merged, never a global
   * sort of the full term table), so the unpartitioned id-assigning window
   * only ever touches the surviving `maxSize` rows.
   */
  def vocabulary(df: DataFrame, textCol: String, maxSize: Int,
      minCount: Long = 1L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val top = termFrequencies(df, textCol)
      .filter(col("n") >= minCount)
      .orderBy(col("n").desc, col("token"))
      .limit(maxSize)
    top.withColumn("token_id",
      row_number().over(Window.orderBy(col("n").desc, col("token"))) - 1)
  }

  /** Per-document quality metrics: token count, average token length,
    * stopword ratio, whitespace-token vs BPE-ish count. */
  /** The ONE definition of every per-document quality metric — both
    * qualityMetrics and qualityFilter build from this list, so the
    * tokenization, stopword list, and zero-token guard cannot drift
    * between them. Zero-token (e.g. whitespace-only) docs: ratios are
    * null on BOTH the engine and the DuckDB oracle (nullif denominator),
    * not a /0 artifact. */
  private def metricExprs(textCol: Column): Seq[(String, Column)] = {
    val toks = tokens(textCol)
    val nToks = size(toks)
    val safeN = nullif(nToks, lit(0))
    val stopwords = Seq("the", "a", "of", "and", "to", "in", "is")
    val stopHits = size(filter(toks, t => t.isin(stopwords.map(s => s: Any): _*)))
    Seq(
      "n_chars" -> length(textCol),
      "n_tokens" -> nToks,
      "n_tokens_bpeish" -> tokenCountBpeIsh(textCol),
      "avg_token_len" -> (length(regexp_replace(textCol, " ", "")).cast(DoubleType) / safeN),
      "stop_ratio" -> (stopHits.cast(DoubleType) / safeN))
  }

  def qualityMetrics(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val m = metricExprs(col(textCol))
    val byName = m.toMap
    df.select(
      col(idCol) +: m.map { case (n, c) => c.as(n) } :+
        (byName("n_tokens").between(20, 10000) && byName("stop_ratio") < 0.5).as("is_quality"): _*)
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

  /** TF-IDF per (document, token): tf = in-document count, idf =
    * ln((N+1)/(df+1)) with add-one smoothing, N = corpus size. Two
    * aggregations (per-doc-token, per-token) + one broadcast-able join —
    * shuffle keys are tokens, never documents², so the shape holds at
    * corpus scale. `ln` results are rounded to 9 dp: transcendental libm
    * calls are the one place engines legitimately differ by an ulp. */
  def tfidf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // corpus size as a broadcast single-row frame — keeps the operator
    // fully lazy (no driver-side action at plan-construction time)
    val n = df.agg(count(lit(1)).as("n_docs"))
    // tf feeds both its own output and the document-frequency rollup —
    // bounded-cache so the tokenize+aggregate pass runs once
    val tf = graft.ops.BoundedCache.cached(
      df.select(col(idCol), explode(tokens(col(textCol))).as("token"))
        .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf")))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    tf.join(dfreq, "token").crossJoin(broadcast(n))
      .withColumn("idf", round(log((col("n_docs") + 1.0) / (col("df") + 1.0)), 9))
      .withColumn("tf_idf", round(col("tf") * col("idf"), 9))
      .select(col(idCol), col("token"), col("tf"), col("df"), col("idf"), col("tf_idf"))
  }

  /** Feature hashing (the hashing trick): token counts folded into a
    * FIXED dimensionality via the engine-wide md5 60-bit content hash mod
    * `dim` — vocabulary-free vectorization, so the feature space needs no
    * fit/broadcast step and is stable under corpus growth (the property
    * that matters for incremental training pipelines). Sparse output
    * (doc, bucket, cnt); densify downstream only if the model needs it. */
  def hashFeatures(df: DataFrame, idCol: String, textCol: String,
      dim: Int = 1024): DataFrame =
    df.select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .select(col(idCol),
        pmod(graft.ops.ApproxDistinct.kmvHash(col("token")), lit(dim.toLong))
          .as("bucket"))
      .groupBy(col(idCol), col("bucket")).agg(count(lit(1)).as("cnt"))

  /** ONE BPE merge iteration — the tokenizer-training primitive, corpus-
    * scale: find the globally most frequent adjacent token pair (ties:
    * lexicographic) and merge its non-overlapping occurrences greedily
    * left-to-right in every document, exactly the sequential tokenizer's
    * semantics, but with no sequential scan: overlap only arises for
    * w1 = w2 runs, where greedy-keep = the even offsets of each island of
    * consecutive start positions — an islands window, not a fold. Emits
    * (doc, w1, w2, n_before, n_after, merged_text); iterate the operator
    * for a full vocabulary build. Shuffles: position explode (one window
    * per doc), pair-count aggregate, top-1 broadcast back. Empty docs
    * carry no positions and drop out. */
  def bpeMergeStep(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = graft.ops.BoundedCache.cached(
      df.select(col(idCol), tokens(col(textCol)).as("ts")))
    val pos = base.select(col(idCol), posexplode(col("ts")).as(Seq("p", "tok")))
    val wDoc = Window.partitionBy(col(idCol)).orderBy("p")
    val withNext = graft.ops.BoundedCache.cached(
      pos.withColumn("nxt", lead(col("tok"), 1).over(wDoc)))
    // cached: the single-row top pair feeds both the kept-starts plan and
    // the rebuilt plan — exchange reuse does not cross the cache boundary,
    // so an uncached top would run the pair-count shuffle + sort twice
    val top = graft.ops.BoundedCache.cached(
      withNext.filter(col("nxt").isNotNull)
        .groupBy("tok", "nxt").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok"), col("nxt"))
        .limit(1).select(col("tok").as("w1"), col("nxt").as("w2")))
    val marked = withNext.crossJoin(broadcast(top))
      .withColumn("is_start", col("tok") === col("w1") && col("nxt") === col("w2"))
    val starts = marked.filter(col("is_start"))
      .withColumn("island", col("p") - row_number().over(wDoc))
      .withColumn("rn2", row_number().over(
        Window.partitionBy(col(idCol), col("island")).orderBy("p")))
      .filter((col("rn2") - 1) % 2 === 0)
      .select(col(idCol), col("p"))
    val kept = graft.ops.BoundedCache.cached(starts)
    val rebuilt = marked
      .join(kept.withColumn("mstart", lit(true)), Seq(idCol, "p"), "left")
      .join(kept.select(col(idCol), (col("p") + 1).as("p"), lit(true).as("consumed")),
        Seq(idCol, "p"), "left")
      .filter(col("consumed").isNull)
      .select(col(idCol), col("p"), col("w1"), col("w2"),
        when(col("mstart"), concat(col("w1"), col("w2"))).otherwise(col("tok")).as("tok2"))
    rebuilt.groupBy(col(idCol), col("w1"), col("w2")).agg(
      count(lit(1)).as("n_after"),
      concat_ws(" ", transform(
        array_sort(collect_list(struct(col("p"), col("tok2")))),
        s => s.getField("tok2"))).as("merged_text"))
      .join(base.select(col(idCol), size(col("ts")).cast("long").as("n_before")), Seq(idCol))
      .select(col(idCol), col("w1"), col("w2"), col("n_before"),
        col("n_after"), col("merged_text"))
  }

  /** FULL BPE vocabulary training — [[bpeMergeStep]] iterated `nMerges`
    * times to produce the tokenizer's merges table (step, w1, w2, cnt).
    * Each iteration is fully distributed (pair-count aggregate + islands
    * merge); the driver sees exactly ONE row per step (the winning pair —
    * the same bounded-driver contract as ConnectedComponents' 1-row
    * convergence checksum), and the sequence frame is localCheckpoint'ed
    * per round so plan depth stays constant. Stops early if no pair
    * remains. For a production-size vocab use [[bpeTrainBatched]], which
    * lands many merges per round. */
  def bpeTrain(df: DataFrame, idCol: String, textCol: String,
      nMerges: Int): DataFrame =
    bpeTrainFull(df, idCol, textCol, nMerges)._1

  /** [[bpeTrain]] exposing BOTH outputs: the merges table and the final
    * TOKENIZED corpus (id, p, tok after every merge) — the apply side of
    * tokenizer training, one frame, no recompute. Single-pair rounds:
    * identical to classic sequential BPE. */
  def bpeTrainFull(df: DataFrame, idCol: String, textCol: String,
      nMerges: Int): (DataFrame, DataFrame) =
    bpeTrainBatched(df, idCol, textCol, rounds = nMerges, batchK = 1)

  /** BATCHED BPE training — the scale form (VERDICT r6 weak item 2): a
    * real 32k-merge vocab cannot afford one full corpus job per merge, so
    * each round lands up to `batchK` merges from ONE pair-count pass.
    *
    * Round rule (deterministic, engine-portable):
    *   1. rank all pair counts by (count desc, w1, w2) and take the top
    *      `batchK` CANDIDATES;
    *   2. thin candidates to the RANK-DOMINANT token-disjoint subset:
    *      a candidate survives iff no higher-ranked candidate shares a
    *      token with it. Token-disjoint pairs cannot overlap in any
    *      document (an overlap would share the middle token), so the
    *      surviving merges commute — applying them simultaneously to the
    *      round-start sequence is well-defined and order-free.
    *   3. apply every surviving merge in ONE greedy left-to-right scan
    *      per document (merge any position starting a surviving pair,
    *      skip the consumed token) — under token-disjointness this is
    *      exactly the simultaneous islands rule: matches of different
    *      pairs can never be adjacent (adjacency would share the middle
    *      token), and same-pair runs merge left-to-right non-overlapping
    *      either way. BpeWitnessSpec's sequential witness IS this scan.
    *
    * Rank-dominance (not greedy-over-survivors) is chosen because it has
    * no sequential dependence: the same set falls out of a self-join in
    * the DuckDB oracle, and BpeWitnessSpec's sequential witness. With
    * `batchK = 1` the rule degenerates to exactly classic BPE (top-1
    * candidate, trivially dominant). Jobs per vocab: O(merges / batchK)
    * — a 32k vocab at batchK=256 is ~125 passes, not 32k. The driver
    * sees `batchK` rows per round (bounded), never data.
    *
    * Round 13 (optimization): the corpus is carried as ONE token array
    * per document, not a position-exploded frame. Per round that leaves
    * exactly one shuffle (the pair-count aggregate, with map-side partial
    * aggregation); the merge application is a per-row `aggregate` fold —
    * the previous implementation paid, per round, a lead() window, two
    * positional self-joins, three more windows and two localCheckpoints
    * over |corpus tokens| rows. Rewrites are narrow maps, so rounds chain
    * lazily off one checkpointed base (re-checkpointed every 8 rounds to
    * bound plan depth for production-size vocabs). */
  def bpeTrainBatched(df: DataFrame, idCol: String, textCol: String,
      rounds: Int, batchK: Int): (DataFrame, DataFrame) = {
    require(rounds >= 0 && batchK >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    var seq = df.select(col(idCol).as("id"), tokens(col(textCol)).as("ts"))
      .localCheckpoint(true)
    // Evaluate-once binding: rounds chain lazily, so the optimizer's
    // project collapsing substitutes round r's WHOLE rewrite expression
    // into every reference of `ts` inside round r+1 (size, per-step
    // element accesses, ...) — evaluation cost would grow exponentially
    // with rounds (observed as a single task pinned for 20+ minutes at
    // sf0.01). Routing the array through a one-element transform binds it
    // to a lambda variable, which IS evaluated once however many times
    // the body reads it, and leaves exactly ONE `ts` reference per round
    // for the collapser to substitute into.
    def bindOnce(arr: Column)(f: Column => Column): Column =
      element_at(transform(array(arr), t => f(t)), 1)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var step = 0
    var round = 1
    var exhausted = false
    while (round <= rounds && !exhausted) {
      val cand = seq.select(explode(bindOnce(col("ts")) { ts =>
          when(size(ts) >= 2,
            transform(sequence(lit(1), size(ts) - 1),
              k => struct(element_at(ts, k).as("tok"),
                element_at(ts, k + 1).as("nxt"))))
          .otherwise(array().cast("array<struct<tok:string,nxt:string>>"))
        }).as("bg"))
        .select(col("bg.tok").as("tok"), col("bg.nxt").as("nxt"))
        .groupBy("tok", "nxt").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok"), col("nxt"))
        .limit(batchK).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (cand.isEmpty) exhausted = true
      else {
        // rank-dominance thinning: survive iff NO higher-ranked
        // CANDIDATE (kept or not) shares a token — rejection does not
        // un-block, so the set is a pure function of the ranked list
        val sel = cand.zipWithIndex.filter { case ((w1, w2, _), i) =>
          !cand.take(i).exists { case (v1, v2, _) =>
            v1 == w1 || v1 == w2 || v2 == w1 || v2 == w2 }
        }.map(_._1)
        sel.foreach { case (w1, w2, cnt) =>
          step += 1; merges += ((step, w1, w2, cnt))
        }
        // merged token iff (cur, nxt) is a surviving pair (at most one
        // can match: the pairs are distinct and token-disjoint)
        def mergedTok(cur: Column, nxt: Column): Column =
          sel.foldLeft(lit(null).cast("string")) { case (acc, (w1, w2, _)) =>
            when(cur === lit(w1) && nxt === lit(w2), lit(w1 + w2)).otherwise(acc)
          }
        val rewritten = bindOnce(col("ts")) { ts =>
          when(size(ts) < 2, ts).otherwise(aggregate(
            sequence(lit(1), size(ts)),
            struct(array().cast("array<string>").as("out"),
              lit(false).as("skip")),
            (st, k) => {
              val cur = element_at(ts, k)
              // guarded: element_at past the end would throw under ANSI
              val m = when(k < size(ts),
                mergedTok(cur, element_at(ts, k + 1)))
              when(st.getField("skip"),
                  struct(st.getField("out").as("out"), lit(false).as("skip")))
                .when(m.isNotNull,
                  struct(concat(st.getField("out"), array(m)).as("out"),
                    lit(true).as("skip")))
                .otherwise(
                  struct(concat(st.getField("out"), array(cur)).as("out"),
                    lit(false).as("skip")))
            },
            st => st.getField("out")))
        }
        seq = seq.select(col("id"), rewritten.as("ts"))
        if (round % 8 == 0) seq = seq.localCheckpoint(true)
      }
      round += 1
    }
    val seqOut = seq.select(col("id"), posexplode(col("ts")).as(Seq("p", "tok")))
    (merges.result().toDF("step", "w1", "w2", "cnt"), seqOut)
  }

  /** Bigram language-model quality scoring — the portable stand-in for
    * KenLM-perplexity corpus filtering: score each document by the mean
    * add-1-smoothed log-probability of its bigrams under the corpus's own
    * bigram model, `lnP(w2|w1) = ln((c(w1,w2)+1)/(ctx(w1)+V))` with
    * `ctx(w1) = Σ_w2 c(w1,w2)` (so probabilities sum to 1 per context)
    * and V the corpus vocabulary size. Low scores = improbable token
    * sequences = boilerplate/garbage candidates.
    *
    * Scale shape: ONE tokenize pass (cached) feeds the bigram-count,
    * context-count and vocabulary aggregates plus the scoring join —
    * shuffles carry bigram occurrences and the two count tables, never
    * docs × vocab. Determinism: each ln is 9-dp-rounded (the [[tfidf]]
    * contract), per-doc sums are exact decimals, one final division.
    * Documents with fewer than 2 tokens have no bigrams and drop out. */
  def bigramLmScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = graft.ops.BoundedCache.cached(
      df.select(col(idCol), tokens(col(textCol)).as("ts")))
    val ts = col("ts")
    val pairs = base
      .select(col(idCol), explode(when(size(ts) >= 2,
        transform(sequence(lit(1), size(ts) - 1),
          i => struct(element_at(ts, i).as("w1"), element_at(ts, i + 1).as("w2"))))
        .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val bi = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val ctx = pairs.groupBy("w1").agg(count(lit(1)).as("cu"))
    val vocab = base.select(explode(ts).as("tok"))
      .agg(countDistinct(col("tok")).as("vs"))
    pairs.join(bi, Seq("w1", "w2")).join(ctx, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .withColumn("lp", round(log((col("cb") + 1.0) / (col("cu") + col("vs"))), 9))
      .groupBy(col(idCol)).agg(
        count(lit(1)).as("n_bigrams"),
        // exact decimal sum ÷ count is already bit-identical across
        // engines; a final cosmetic round would re-introduce divergence
        // exactly at half-boundary values (observed at sf0.1)
        (sum(col("lp").cast(DecimalType(28, 12))).cast(DoubleType)
          / count(lit(1))).as("avg_logp"))
  }

  /** Sparse TF-IDF cosine similarity pairs via an INVERTED-INDEX join —
    * the lexical sibling of the dense-embedding near-dup path
    * ([[graft.ext.SimSearch]]): docs are sparse weight vectors over their
    * tokens; the pairwise dot product is computed by joining postings on
    * token and summing weight products, so shuffle volume is Σ df² over
    * the index, never docs². High-df tokens (df > `maxDf`) are pruned
    * from the index first — they carry near-zero idf weight yet dominate
    * Σ df² quadratically; the oracle prunes identically, so the check
    * stays a hash match (of the pruned-vector cosine, a declared
    * semantic, not an approximation drift).
    *
    * Determinism: weights are 9-dp-rounded tf·idf (the [[tfidf]]
    * contract); dot products and norms are exact DECIMAL sums of
    * per-term doubles — order-independent — finished by one sqrt, one
    * multiply, one divide, all correctly-rounded IEEE; the quotient is
    * served unrounded (a cosmetic round diverges across engines at half
    * boundaries). */
  def sparseCosinePairs(df: DataFrame, idCol: String, textCol: String,
      maxDf: Int = 10, minSim: Double = 0.3): DataFrame = {
    val w = graft.ops.BoundedCache.cached(
      tfidf(df, idCol, textCol)
        .filter(col("df") <= maxDf)
        .select(col(idCol), col("token"), col("tf_idf").as("w")))
    // Two numeric hazards meet here, and the shape below threads between
    // them. (1) Casting a DOUBLE product to decimal systematically lands
    // on half-ties (true products of two 9-dp values are exact 18-decimal
    // rationals) where the engines' double→decimal rounding can disagree
    // — so recover each weight EXACTLY as DECIMAL(14,9) (always
    // representable; the double is within an ulp, no tie possible) and
    // multiply in decimal: the 18-scale product is exact, and the
    // reduction to scale 12 is a DECIMAL→decimal cast whose ties resolve
    // identically (half-up on positives) in both engines. (2) Keeping the
    // SUM at scale 18 would push the scaled integer past 2⁵³, where
    // DuckDB's decimal→double cast double-rounds (observed 1-ulp drift on
    // every row) — scale 12 keeps the final cast single-rounded. The
    // scale-12 reduction is Spark's decimal cast (HALF_UP); DuckDB's
    // decimal CAST TRUNCATES, so the oracle reduces with round(x, 12)
    // (half-away-from-zero ≡ HALF_UP on these non-negative products).
    val wd = col("w").cast(DecimalType(14, 9))
    // zero-norm docs (all tokens at idf 0) would make cos = 0/0 = NaN,
    // and NaN sorts ABOVE every threshold — drop them from the index
    val norms = w.select(col(idCol), wd.as("wd"))
      .groupBy(col(idCol)).agg(
        sqrt(sum((col("wd") * col("wd")).cast(DecimalType(28, 12)))
          .cast(DoubleType)).as("nrm"))
      .filter(col("nrm") > 0)
    // the quotient of exact-decimal-derived doubles is already
    // bit-identical across engines; a final cosmetic round would diverge
    // exactly at half-boundary values (the bigramLmScore lesson)
    w.select(col(idCol).as("d1"), col("token"), wd.as("w1"))
      .join(w.select(col(idCol).as("d2"), col("token"), wd.as("w2")), "token")
      .filter(col("d1") < col("d2"))
      .groupBy("d1", "d2")
      .agg(sum((col("w1") * col("w2")).cast(DecimalType(28, 12)))
        .cast(DoubleType).as("dot"))
      .join(norms.select(col(idCol).as("d1"), col("nrm").as("n1")), "d1")
      .join(norms.select(col(idCol).as("d2"), col("nrm").as("n2")), "d2")
      .withColumn("cos", col("dot") / (col("n1") * col("n2")))
      .filter(col("cos") >= minSim)
      .select("d1", "d2", "cos")
  }

  /** C4-style quality gate: keep documents passing every heuristic —
    * token count in range, mean token length sane, enough stopword
    * evidence of natural language, and not ALL-CAPS shouting. Returns the
    * surviving rows with their metrics (composable with dedup/clustering
    * downstream). Pure filter over [[qualityMetrics]] — one scan. */
  def qualityFilter(df: DataFrame, idCol: String, textCol: String,
      minTokens: Int = 20, maxTokens: Int = 10000,
      minAvgLen: Double = 3.0, maxAvgLen: Double = 12.0,
      minStopRatio: Double = 0.05): DataFrame = {
    // metrics are computed INLINE on the same scan (a join against
    // qualityMetrics would read the corpus twice), from the same shared
    // definitions; source columns that clash with a metric name yield to
    // the freshly computed metric
    val metrics = metricExprs(col(textCol))
    val base = df.columns.filterNot(c => metrics.exists(_._1 == c)).map(col)
    df.select(base ++ metrics.map { case (n, c) => c.as(n) }: _*)
      .filter(col("n_tokens").between(minTokens, maxTokens)
        && col("avg_token_len").between(minAvgLen, maxAvgLen)
        && col("stop_ratio") >= minStopRatio
        && col(textCol) =!= upper(col(textCol)))
  }

  /** Gopher-style repetition signals per document: duplicate-token
    * fraction, most-frequent-token fraction, duplicate-2-gram fraction —
    * the classic "remove boilerplate/spam" quality rules for training
    * corpora. Pure column expressions over the token array (per-doc cost
    * bounded by document length, embarrassingly parallel, ZERO shuffle —
    * the explode+groupBy formulation would shuffle |corpus tokens| rows).
    * Zero/one-token docs yield null fractions (nullif denominators), never
    * a /0 artifact. */
  def repetitionMetrics(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // named token column: the top-token count runs a filter(toks, …) per
    // DISTINCT token — with the tokenize subtree inlined in the lambda
    // that re-splits the document O(distinct) times per doc (the
    // q_text_ngrams lesson)
    val pre = df.select(col(idCol), tokens(col(textCol)).as("__toks"))
    val toks = col("__toks")
    val nToks = size(toks)
    val safeN = nullif(nToks, lit(0)).cast(DoubleType)
    val distinctToks = array_distinct(toks)
    // max occurrence count of any single token: per distinct token, count
    // its hits in the full token stream (O(n·distinct) per doc — bounded
    // by doc length², data-parallel, no state)
    val topN = array_max(transform(distinctToks, d => size(filter(toks, t => t === d))))
    val bigrams = when(nToks < 2, array().cast("array<string>"))
      .otherwise(zip_with(
        slice(toks, lit(1), nToks - 1),
        slice(toks, lit(2), nToks - 1),
        (a, b) => concat(a, lit(" "), b)))
    val safeBi = nullif(size(bigrams), lit(0)).cast(DoubleType)
    pre.select(
      col(idCol),
      nToks.as("n_tokens"),
      (lit(1.0) - size(distinctToks) / safeN).as("dup_token_frac"),
      (topN / safeN).as("top_token_frac"),
      (lit(1.0) - size(array_distinct(bigrams)) / safeBi).as("dup_2gram_frac"))
  }

  /** PII scrubbing: redact email addresses, long digit runs (phone/account
    * numbers), and IPv4 literals with typed placeholders. Plain
    * `regexp_replace` (replace-all on both engines; patterns avoid
    * lookarounds so the dialects agree) — codegen'd, no UDF. */
  def scrubPii(textCol: Column): Column = {
    val email = regexp_replace(textCol, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ip = regexp_replace(email, "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>")
    regexp_replace(ip, "\\d{7,}", "<NUM>")
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
