package graft.queries

import org.apache.spark.sql.functions._

import org.apache.spark.sql.types.DecimalType

import graft.ext.{TextStats, UnigramLM}
import graft.ops.{Mixture, Packing, PrefixSum, Sampling}
import QueryUtil._

/**
 * Training-data assembly wave: the operators that turn a cleaned corpus
 * into model inputs — sequence packing under a token budget, vocabulary
 * construction, stable train/val/test splitting, and stratum-balanced
 * mixture capping. All derive order/assignment from content (md5 hex,
 * integer prefix sums) rather than engine RNG, so every one of them
 * hash-checks against a DuckDB oracle running the same math.
 */
object Assembly {

  /** DuckDB body for TextStats.tokens: lower, split on space, drop empties. */
  private def oToks(textExpr: String): String =
    s"list_filter(string_split(lower($textExpr), ' '), x -> x <> '')"

  private val packSequences = Q(
    "q_pack_sequences",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val weighted = docs.select(col("doc_id"), col("lang"),
        size(TextStats.tokens(col("text"))).as("n_tokens"))
      Packing.packGreedy(weighted, Seq("lang"), "doc_id", "n_tokens", budget = 2048L)
        .select("doc_id", "lang", "n_tokens", "seq_id", "seq_offset")
        .orderBy("lang", "doc_id")
    },
    Some(s"""WITH toks AS (
            |  SELECT doc_id, lang,
            |    CAST(len(${oToks("text")}) AS INTEGER) AS n_tokens
            |  FROM documents),
            |c AS (
            |  SELECT doc_id, lang, n_tokens,
            |    CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
            |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            |      - n_tokens AS start
            |  FROM toks)
            |SELECT doc_id, lang, n_tokens,
            |  CAST(floor(start / 2048) AS BIGINT) AS seq_id,
            |  CAST(start % 2048 AS BIGINT) AS seq_offset
            |FROM c ORDER BY lang, doc_id""".stripMargin))

  private val vocabBuild = Q(
    "q_vocab_build",
    (s, dir) =>
      TextStats.vocabulary(t(s, dir, "documents"), "text",
        maxSize = 1000, minCount = 2L)
        .orderBy("token_id"),
    Some(s"""WITH tf AS (
            |  SELECT unnest(${oToks("text")}) AS token FROM documents),
            |cnt AS (SELECT token, COUNT(*) AS n FROM tf GROUP BY 1
            |        HAVING COUNT(*) >= 2),
            |r AS (SELECT token, n,
            |        CAST(row_number() OVER (ORDER BY n DESC, token) AS INTEGER) - 1
            |          AS token_id
            |      FROM cnt)
            |SELECT token, n, token_id FROM r WHERE token_id < 1000
            |ORDER BY token_id""".stripMargin))

  // ---- unigram-LM tokenizer (SentencePiece EM core) ----------------------
  // Shared DuckDB chain: candidate substring vocab → EM rounds, each an
  // EXHAUSTIVE-path Viterbi (recursive CTE) — provably equal to the
  // engine's pruned per-position DP because scores are exact
  // DECIMAL(28,9) sums of 9-dp-rounded lns and the (score DESC, np,
  // path) order is prefix-optimal (see ext/UnigramLM's scaladoc).
  private def unigramEm(round: Int, vocabIn: String): String =
    s"""r$round(word, pos, score, np, path) AS (
       |  SELECT word, 0, CAST(0 AS DECIMAL(28,9)), 0, '' FROM uwords
       |  UNION ALL
       |  SELECT r$round.word, r$round.pos + length(v.piece),
       |    CAST(r$round.score + v.lnp AS DECIMAL(28,9)), r$round.np + 1,
       |    CASE WHEN r$round.path = '' THEN v.piece
       |         ELSE r$round.path || ' ' || v.piece END
       |  FROM r$round JOIN $vocabIn v
       |    ON r$round.pos + length(v.piece) <= length(r$round.word)
       |   AND substr(r$round.word, r$round.pos + 1, length(v.piece)) = v.piece),
       |seg$round AS (
       |  SELECT word, path, np FROM (
       |    SELECT word, path, np, row_number() OVER (PARTITION BY word
       |      ORDER BY score DESC, np, path) AS rk
       |    FROM r$round WHERE pos = length(word)) WHERE rk = 1),
       |pc$round AS (SELECT word, unnest(string_split(path, ' ')) AS piece FROM seg$round),
       |c$round AS (SELECT piece, CAST(SUM(freq) AS BIGINT) AS n
       |  FROM pc$round JOIN uwords USING (word) GROUP BY piece),
       |t$round AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM c$round),
       |vocab$round AS (SELECT piece, CAST(round(ln(1.0*n/tot), 9) AS DECIMAL(28,9)) AS lnp
       |  FROM c$round, t$round)""".stripMargin

  private def unigramCtes: String =
    s"""utoks AS (SELECT unnest(${oToks("text")}) AS word FROM documents),
       |uwords AS (SELECT word, COUNT(*) AS freq FROM utoks
       |           WHERE length(word) <= 24 GROUP BY 1),
       |ucand AS (
       |  SELECT substr(word, i+1, l) AS piece, freq
       |  FROM uwords,
       |    LATERAL (SELECT unnest(range(0, length(word))) AS i) ii,
       |    LATERAL (SELECT unnest(range(1, least(4, length(word)-i)+1)) AS l) ll),
       |c0 AS (SELECT piece, CAST(SUM(freq) AS BIGINT) AS n FROM ucand GROUP BY 1),
       |v0n AS (SELECT piece, n FROM c0 WHERE n >= 2 OR length(piece) = 1),
       |t0 AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM v0n),
       |vocab0 AS (SELECT piece, CAST(round(ln(1.0*n/tot), 9) AS DECIMAL(28,9)) AS lnp
       |  FROM v0n, t0),
       |${unigramEm(1, "vocab0")},
       |${unigramEm(2, "vocab1")}""".stripMargin

  private val unigramTrain = Q(
    "q_unigram_train",
    (s, dir) =>
      UnigramLM.train(t(s, dir, "documents"), "text",
        maxPieceLen = 4, minCount = 2L, emIters = 2, vocabSize = 200)
        .orderBy("token_id"),
    Some(s"""WITH RECURSIVE $unigramCtes
            |SELECT token_id, piece, n, lnp FROM (
            |  SELECT CAST(row_number() OVER (ORDER BY n DESC, piece) - 1 AS INTEGER)
            |           AS token_id,
            |         piece, n, round(ln(1.0*n/tot), 9) AS lnp
            |  FROM c2, t2)
            |WHERE token_id < 200 ORDER BY token_id""".stripMargin))

  private val unigramSegment = Q(
    "q_unigram_segment",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      // UNtruncated final vocab: truncation would leave rare words
      // uncoverable; the oracle's vocab2 is likewise untruncated
      val vocab = UnigramLM.train(docs, "text", maxPieceLen = 4,
        minCount = 2L, emIters = 2, vocabSize = Int.MaxValue)
        .select("piece", "lnp")
      UnigramLM.segment(docs, "text", vocab, maxPieceLen = 4)
        .orderBy("word")
    },
    Some(s"""WITH RECURSIVE $unigramCtes,
            |${unigramEm(3, "vocab2")}
            |SELECT s.word AS word, w.freq AS freq, s.path AS path,
            |  CAST(s.np AS INTEGER) AS n_pieces
            |FROM seg3 s JOIN uwords w USING (word) ORDER BY word""".stripMargin))

  private val splitAssign = Q(
    "q_split_assign",
    (s, dir) =>
      Sampling.hashSplit(t(s, dir, "documents"), "doc_id")
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(TextStats.tokens(col("text")))).as("n_tokens"))
        .orderBy("split", "lang"),
    Some(s"""SELECT split, lang, COUNT(*) AS n_docs,
            |  CAST(SUM(CAST(len(${oToks("text")}) AS INTEGER)) AS BIGINT) AS n_tokens
            |FROM (SELECT lang, text,
            |        CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
            |               THEN 'train'
            |             WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
            |               THEN 'val'
            |             ELSE 'test' END AS split
            |      FROM documents)
            |GROUP BY split, lang ORDER BY split, lang""".stripMargin))

  private val balanceLangs = Q(
    "q_balance_langs",
    (s, dir) =>
      Sampling.balancedSample(
        t(s, dir, "documents").select("doc_id", "lang"), Seq("lang"), "doc_id")
        .select("lang", "sample_rank", "doc_id")
        .orderBy("lang", "sample_rank"),
    Some("""WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
           |m AS (SELECT MIN(n) AS k FROM c),
           |r AS (SELECT lang, doc_id,
           |        CAST(row_number() OVER (PARTITION BY lang
           |          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INTEGER)
           |          AS sample_rank
           |      FROM documents)
           |SELECT lang, sample_rank, doc_id FROM r, m WHERE sample_rank <= k
           |ORDER BY lang, sample_rank""".stripMargin))

  private val packGlobal = Q(
    "q_pack_global",
    (s, dir) => {
      val weighted = t(s, dir, "documents").select(col("doc_id"),
        size(TextStats.tokens(col("text"))).as("n_tokens"))
      Packing.packGreedyGlobal(weighted, "doc_id", "n_tokens", budget = 1024L)
        .select("doc_id", "n_tokens", "seq_id", "seq_offset")
        .orderBy("doc_id")
    },
    Some(s"""WITH toks AS (
            |  SELECT doc_id,
            |    CAST(len(${oToks("text")}) AS INTEGER) AS n_tokens
            |  FROM documents),
            |c AS (
            |  SELECT doc_id, n_tokens,
            |    CAST(sum(n_tokens) OVER (ORDER BY doc_id
            |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            |      - n_tokens AS start
            |  FROM toks)
            |SELECT doc_id, n_tokens,
            |  CAST(floor(start / 1024) AS BIGINT) AS seq_id,
            |  CAST(start % 1024 AS BIGINT) AS seq_offset
            |FROM c ORDER BY doc_id""".stripMargin))

  private val chunkDocs = Q(
    "q_chunk_docs",
    (s, dir) => {
      val weighted = t(s, dir, "documents").select(col("doc_id"), col("lang"),
        size(TextStats.tokens(col("text"))).as("n_tokens"))
      Packing.chunkByBudget(weighted, "n_tokens", budget = 256L)
        .select("doc_id", "lang", "n_tokens", "chunk_id", "chunk_tokens")
        .orderBy("doc_id", "chunk_id")
    },
    Some(s"""WITH toks AS (
            |  SELECT doc_id, lang,
            |    CAST(len(${oToks("text")}) AS INTEGER) AS n_tokens
            |  FROM documents),
            |c AS (SELECT *, CAST((n_tokens + 255) // 256 AS BIGINT) AS nc
            |      FROM toks WHERE n_tokens > 0)
            |SELECT doc_id, lang, n_tokens,
            |  unnest(generate_series(0, nc - 1)) AS chunk_id,
            |  CAST(least(256, n_tokens - unnest(generate_series(0, nc - 1)) * 256)
            |    AS BIGINT) AS chunk_tokens
            |FROM c ORDER BY doc_id, chunk_id""".stripMargin))

  private val interleaveMix = Q(
    "q_interleave_mix",
    (s, dir) =>
      Mixture.interleaveByWeight(
        t(s, dir, "documents").select("doc_id", "lang"), "lang", "doc_id",
        Map("en" -> 5, "de" -> 2, "fr" -> 2, "es" -> 2, "zh" -> 1))
        .select("mix_priority", "lang", "stratum_rank", "doc_id")
        .orderBy("mix_priority", "lang", "doc_id"),
    Some("""WITH r AS (
           |  SELECT lang, doc_id,
           |    CAST(row_number() OVER (PARTITION BY lang
           |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
           |      AS stratum_rank,
           |    CASE lang WHEN 'en' THEN 5 WHEN 'de' THEN 2 WHEN 'fr' THEN 2
           |              WHEN 'es' THEN 2 WHEN 'zh' THEN 1 ELSE 1 END AS w
           |  FROM documents)
           |SELECT CAST(((2 * stratum_rank - 1) * 720720) // (2 * w) AS BIGINT)
           |    AS mix_priority,
           |  lang, stratum_rank, doc_id
           |FROM r ORDER BY mix_priority, lang, doc_id""".stripMargin))

  // Corpus tokenization against the trained vocabulary: text → (pos,
  // token_id) rows, OOV → -1. The explode is shuffle-free; the vocab join
  // broadcasts (the vocabulary is maxSize rows by construction) — the
  // text-to-ids step every training pipeline runs after vocab build.
  private val textToIds = Q(
    "q_text_to_ids",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val vocab = TextStats.vocabulary(docs, "text", maxSize = 1000, minCount = 2L)
        .select("token", "token_id")
      docs.filter(col("doc_id") < 50)
        .select(col("doc_id"),
          posexplode(TextStats.tokens(col("text"))).as(Seq("pos", "token")))
        .join(broadcast(vocab), Seq("token"), "left")
        .select(col("doc_id"), col("pos"),
          coalesce(col("token_id"), lit(-1)).as("token_id"))
        .orderBy("doc_id", "pos")
    },
    Some(s"""WITH d AS (SELECT doc_id, ${oToks("text")} AS toks
            |           FROM documents WHERE doc_id < 50),
            |e AS (SELECT doc_id, CAST(j AS INTEGER) AS pos, toks[j + 1] AS token
            |      FROM d, LATERAL (SELECT unnest(range(len(toks))) AS j)),
            |tf AS (SELECT unnest(${oToks("text")}) AS token FROM documents),
            |cnt AS (SELECT token, COUNT(*) AS n FROM tf GROUP BY 1
            |        HAVING COUNT(*) >= 2),
            |vocab AS (SELECT token, token_id FROM (
            |  SELECT token,
            |    CAST(row_number() OVER (ORDER BY n DESC, token) AS INTEGER) - 1
            |      AS token_id
            |  FROM cnt) WHERE token_id < 1000)
            |SELECT e.doc_id, e.pos, coalesce(v.token_id, -1) AS token_id
            |FROM e LEFT JOIN vocab v USING (token)
            |ORDER BY doc_id, pos""".stripMargin))

  // Per-source cap in quality order (n_chars desc as the stand-in quality
  // signal): bound any one source to its 10 best documents — the
  // FineWeb-style domain-capping rule. Distinct from q_balance_langs:
  // policy-constant cap + meaningful ranking vs min-stratum + hash order.
  private val sourceCap = Q(
    "q_source_cap",
    (s, dir) =>
      Mixture.capPerStratum(
        t(s, dir, "documents").select("doc_id", "source", "n_chars"),
        Seq("source"), Seq(col("n_chars").desc, col("doc_id")), cap = 10)
        .select("source", "stratum_rank", "doc_id", "n_chars")
        .orderBy("source", "stratum_rank"),
    Some("""SELECT source, stratum_rank, doc_id, n_chars FROM (
           |  SELECT source, doc_id, n_chars,
           |    CAST(row_number() OVER (PARTITION BY source
           |      ORDER BY n_chars DESC, doc_id) AS BIGINT) AS stratum_rank
           |  FROM documents)
           |WHERE stratum_rank <= 10
           |ORDER BY source, stratum_rank""".stripMargin))

  // Greedy budget fill: best documents first (n_chars desc, doc_id tie)
  // until a 50k-char corpus budget is spent; the row that crosses the
  // boundary is kept (greedy semantics). Runs on the two-pass parallel
  // prefix sum — the oracle's single cumulative window is exactly the
  // shape the operator exists to avoid at scale.
  private val tokenBudget = Q(
    "q_token_budget",
    (s, dir) =>
      // order = (n_chars DESC, doc_id): -n_chars is the numeric range
      // key, doc_id the tie column — NOT a packed single-long key like
      // doc_id - n_chars*10^6, whose encoding collapses at doc_id ≥ 10^6
      // (caught by the sf1 probe; see Packing.packGreedyGlobal doc)
      Mixture.selectByBudget(
        t(s, dir, "documents").select("doc_id", "source", "n_chars")
          .withColumn("__ord", -col("n_chars")),
        "__ord", "n_chars", budget = 50000L, tieCols = Seq("doc_id"))
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id"),
    Some("""SELECT doc_id, source, n_chars FROM (
           |  SELECT doc_id, source, n_chars,
           |    CAST(sum(n_chars) OVER (ORDER BY n_chars DESC, doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           |      - n_chars AS start
           |  FROM documents)
           |WHERE start < 50000
           |ORDER BY doc_id""".stripMargin))

  // Temperature-balanced mixture weights (α = 1/2 — the multilingual
  // upweight-low-resource recipe). α is fixed at 1/2 because IEEE sqrt is
  // correctly rounded on every engine where a general pow(c, α) is not;
  // the normalizer is an exact decimal sum, so shares are bit-portable.
  private val mixTemperature = Q(
    "q_mix_temperature",
    (s, dir) =>
      Mixture.temperatureWeights(t(s, dir, "documents"), "lang", budget = 100000L)
        .orderBy("lang"),
    Some("""WITH c AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
           |sq AS (SELECT lang, n_docs, sqrt(CAST(n_docs AS DOUBLE)) AS sqrt_n FROM c),
           |z AS (SELECT CAST(SUM(CAST(sqrt_n AS DECIMAL(28,12))) AS DOUBLE) AS z FROM sq)
           |SELECT lang, CAST(n_docs AS BIGINT) AS n_docs, sqrt_n,
           |  sqrt_n / z AS share,
           |  CAST(floor(sqrt_n / z * 100000) AS BIGINT) AS target_docs
           |FROM sq, z ORDER BY lang""".stripMargin))

  // Mixture MATERIALIZATION: q_mix_temperature SETS per-language repeat
  // weights; this step actually emits the upsampled epoch. Fractional
  // weights resolve by deterministic stochastic rounding — repeat =
  // ⌊w⌋ + [md5-uniform(doc) < frac(w)] — so E[copies] = w·n exactly,
  // reruns are bit-identical, and no RNG state rides the cluster. The
  // fractional threshold compares 60-bit INTEGERS (frac·2^60 is exact
  // for the binary-representable weights), never floats. Explode fan-out
  // is ≤ ⌈w⌉ per row with ZERO shuffle before the audit aggregate — at
  // scale the exploded stream goes straight to the sink and the
  // aggregate is the data-card check that lands next to it.
  private val upsampleWeights = Seq(
    ("en", 1.0), ("de", 2.5), ("fr", 2.0), ("es", 1.75), ("zh", 3.25))

  // Loss-aware mixture reweighting (round 6, DoReMi-flavored one-shot):
  // domain weight ∝ √n_d · growth(η·excess_d) with excess = the domain's
  // LM-loss above the easiest domain — upweight what the (bigram proxy)
  // model finds hard, temper by size. √ and the exact-decimal sums keep
  // it portable (α = 1/2 IS the temperature recipe, q_temperature_mix);
  // η = 0.5 dyadic. Round 7: the exponential is the COMPOUND-GROWTH
  // surrogate (1 + η·x/16)^16 — exp's defining limit at k=16 — built
  // from four explicit squarings, so every op in the tree is a
  // correctly-rounded IEEE *,/ (no libm exp(), whose last-ulp varies by
  // platform; the repo standard set by q_quality_margin). η·x and /16
  // are exact power-of-two scalings, so both engines round identically
  // at each of the five multiply steps. Scale shape: the bigram LM
  // aggregates (corpus ∝ shuffles, proven by q_text_lmscore) then
  // ~|domains| rows of arithmetic — at 100 TB the model signal comes
  // from the proxy score table, never a per-row loop.
  /** The reweighting chain shared by q_mixture_reweight and
    * q_mixture_allocate: (lang, n_docs, mean_logp, excess, weight). */
  private def lossAwareWeights(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
      val docs = t(s, dir, "documents")
      val scored = TextStats.bigramLmScore(docs, "doc_id", "text")
      val byLang = docs.select("doc_id", "lang").join(scored, "doc_id")
        .groupBy("lang").agg(
          count(lit(1)).as("n_docs"),
          (sum(col("avg_logp").cast(DecimalType(28, 12))).cast("double")
            / count(lit(1))).as("__m"))
        .withColumn("mean_logp", round(col("__m"), 9))
        .drop("__m")
      val lmin = byLang.agg(min(-col("mean_logp")).as("lmin"))
      val b = lit(1.0) + lit(0.5) * col("excess") / lit(16.0)
      val b2 = b * b; val b4 = b2 * b2; val b8 = b4 * b4; val b16 = b8 * b8
      val w = byLang.crossJoin(broadcast(lmin))
        .withColumn("excess", round(-col("mean_logp") - col("lmin"), 9))
        .withColumn("w_raw", round(sqrt(col("n_docs")) * b16, 9))
      val tot = w.agg(sum(col("w_raw").cast(DecimalType(28, 12))).as("tw"))
      w.crossJoin(broadcast(tot))
        .select(col("lang"), col("n_docs"), col("mean_logp"), col("excess"),
          round(col("w_raw") / col("tw").cast("double"), 9).as("weight"))
  }

  /** DuckDB CTE chain matching [[lossAwareWeights]] (ends at `wt`:
    * lang, n_docs, mean_logp, excess, weight). */
  private val lossAwareWeightsCtes: String =
    """toks AS (
      |  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS ts
      |  FROM documents),
      |pairs AS (
      |  SELECT doc_id,
      |    unnest(list_transform(generate_series(1, len(ts) - 1), i -> ts[i])) AS w1,
      |    unnest(list_transform(generate_series(1, len(ts) - 1), i -> ts[i + 1])) AS w2
      |  FROM toks),
      |bi AS (SELECT w1, w2, COUNT(*) AS cb FROM pairs GROUP BY 1, 2),
      |ctx AS (SELECT w1, COUNT(*) AS cu FROM pairs GROUP BY 1),
      |v AS (SELECT COUNT(DISTINCT tok) AS vs
      |      FROM (SELECT unnest(ts) AS tok FROM toks)),
      |sc AS (
      |  SELECT doc_id, round(ln((cb + 1.0) / (cu + vs)), 9) AS lp
      |  FROM pairs JOIN bi USING (w1, w2) JOIN ctx USING (w1) CROSS JOIN v),
      |doc AS (
      |  SELECT doc_id,
      |    CAST(SUM(CAST(lp AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS avg_logp
      |  FROM sc GROUP BY doc_id),
      |lang_ AS (
      |  SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    round(CAST(SUM(CAST(s.avg_logp AS DECIMAL(28,12))) AS DOUBLE)
      |      / COUNT(*), 9) AS mean_logp
      |  FROM documents d JOIN doc s USING (doc_id) GROUP BY d.lang),
      |m AS (SELECT MIN(-mean_logp) AS lmin FROM lang_),
      |e AS (
      |  SELECT lang, n_docs, mean_logp,
      |    round(-mean_logp - lmin, 9) AS excess
      |  FROM lang_, m),
      |g1 AS (SELECT *, 1.0 + 0.5 * excess / 16.0 AS b FROM e),
      |g2 AS (SELECT *, b * b AS b2 FROM g1),
      |g3 AS (SELECT *, b2 * b2 AS b4 FROM g2),
      |g4 AS (SELECT *, b4 * b4 AS b8 FROM g3),
      |w AS (
      |  SELECT lang, n_docs, mean_logp, excess,
      |    round(sqrt(n_docs) * (b8 * b8), 9) AS w_raw
      |  FROM g4),
      |t AS (SELECT SUM(CAST(w_raw AS DECIMAL(28,12))) AS tw FROM w),
      |wt AS (
      |  SELECT lang, n_docs, mean_logp, excess,
      |    round(w_raw / CAST(tw AS DOUBLE), 9) AS weight
      |  FROM w, t)""".stripMargin

  private val mixtureReweight = Q(
    "q_mixture_reweight",
    (s, dir) => lossAwareWeights(s, dir).orderBy("lang"),
    Some(s"""WITH $lossAwareWeightsCtes
            |SELECT lang, n_docs, mean_logp, excess, weight
            |FROM wt ORDER BY lang""".stripMargin))

  // Budget ALLOCATION from the loss-aware weights (round 6): the step
  // that turns weights into an actual corpus slice — each domain gets
  // budget_d = floor(weight_d · B) tokens and fills it greedily in
  // content-hash order (the deterministic uniform shuffle every sampler
  // here uses), so the emitted slice is reproducible and unbiased within
  // each domain. Round 7: the per-domain cumulative sum runs through
  // PrefixSum.runningSumsBy — parallelism |ranges|×|domains|, not
  // |domains| (a bare Window.partitionBy(lang) would push an entire
  // ~20 TB domain through ONE task at 100 TB with ~5 languages). The
  // greedy order key is the 60-bit md5 hash (uniform, so one global set
  // of range bounds serves every domain), tie-broken by doc_id —
  // mirrored verbatim in the oracle's window ORDER BY.
  private val mixtureAllocate = Q(
    "q_mixture_allocate",
    (s, dir) => {
      val budgetTotal = 100000.0
      val wts = lossAwareWeights(s, dir)
        .select(col("lang"),
          floor(col("weight") * lit(budgetTotal)).cast("long").as("budget_tokens"))
      val docs = t(s, dir, "documents").select(col("doc_id"), col("lang"),
        size(TextStats.tokens(col("text"))).cast("long").as("n_tokens"))
        .withColumn("u", conv(substring(md5(col("doc_id").cast("string")), 1, 15),
          16, 10).cast("long"))
      graft.ops.PrefixSum.runningSumsBy(docs, "lang", "u", Seq("doc_id"),
          Seq("n_tokens"), Seq("cum"))
        .join(broadcast(wts), "lang")
        .filter(col("cum") - col("n_tokens") < col("budget_tokens"))
        .groupBy("lang", "budget_tokens")
        .agg(count(lit(1)).as("n_selected"),
          sum(col("n_tokens")).as("tokens_selected"),
          sum(col("doc_id")).as("checksum"))
        .orderBy("lang")
    },
    Some(s"""WITH $lossAwareWeightsCtes,
            |budget AS (
            |  SELECT lang, CAST(floor(weight * 100000.0) AS BIGINT) AS budget_tokens
            |  FROM wt),
            |d AS (
            |  SELECT doc_id, lang,
            |    CAST(len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
            |      AS BIGINT) AS n_tokens,
            |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS u
            |  FROM documents),
            |c AS (
            |  SELECT doc_id, lang, n_tokens,
            |    CAST(SUM(n_tokens) OVER (PARTITION BY lang
            |      ORDER BY u, doc_id
            |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
            |  FROM d)
            |SELECT c.lang, b.budget_tokens,
            |  CAST(COUNT(*) AS BIGINT) AS n_selected,
            |  CAST(SUM(n_tokens) AS BIGINT) AS tokens_selected,
            |  CAST(SUM(doc_id) AS BIGINT) AS checksum
            |FROM c JOIN budget b ON b.lang = c.lang
            |WHERE cum - n_tokens < budget_tokens
            |GROUP BY c.lang, b.budget_tokens
            |ORDER BY c.lang""".stripMargin))

  private val upsampleMix = Q(
    "q_upsample_mix",
    (s, dir) => {
      // Cross-engine guard: Spark truncates (w-⌊w⌋)·2^60 via toLong while
      // the DuckDB oracle CASTs (round-to-nearest). They agree iff every
      // fractional part is exactly representable at 2^-60 — fail loudly on
      // a non-dyadic weight (e.g. 1.1) instead of diverging by 1 ulp.
      upsampleWeights.foreach { case (l, w) =>
        val frac = (w - math.floor(w)) * math.pow(2, 60)
        require(frac == math.rint(frac),
          s"upsample weight $w for '$l' has a non-dyadic fraction; " +
            "Spark trunc vs DuckDB round would diverge")
      }
      def chain(f: Double => Long) =
        upsampleWeights.tail.foldLeft(
          when(col("lang") === upsampleWeights.head._1, lit(f(upsampleWeights.head._2)))) {
          case (acc, (l, wt)) => acc.when(col("lang") === l, lit(f(wt)))
        }.otherwise(lit(f(1.0)))
      val u = conv(substring(md5(concat(lit("up:"), col("doc_id").cast("string"))), 1, 15), 16, 10)
        .cast("long")
      val rep = chain(w => math.floor(w).toLong) +
        when(u < chain(w => ((w - math.floor(w)) * math.pow(2, 60)).toLong), 1L)
          .otherwise(0L)
      t(s, dir, "documents").select(col("doc_id"), col("lang"))
        .withColumn("rep", rep)
        .select(col("doc_id"), col("lang"),
          explode(sequence(lit(1L), col("rep"))).as("copy"))
        .groupBy("lang").agg(
          countDistinct("doc_id").as("n_docs"),
          count(lit(1)).as("n_copies"),
          (count(lit(1)).cast("double") / countDistinct("doc_id")).as("ratio"),
          sum(col("doc_id") * col("copy")).as("checksum"))
        .orderBy("lang")
    },
    Some("""WITH w AS (
           |  SELECT doc_id, lang,
           |    CASE lang WHEN 'de' THEN 2.5::DOUBLE WHEN 'fr' THEN 2.0::DOUBLE
           |      WHEN 'es' THEN 1.75::DOUBLE WHEN 'zh' THEN 3.25::DOUBLE
           |      ELSE 1.0::DOUBLE END AS wt,
           |    ('0x' || substr(md5('up:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS u
           |  FROM documents),
           |r AS (
           |  SELECT doc_id, lang, CAST(floor(wt) AS BIGINT)
           |    + CASE WHEN u < CAST((wt - floor(wt)) * 1152921504606846976.0::DOUBLE AS BIGINT)
           |      THEN 1 ELSE 0 END AS rep
           |  FROM w),
           |c AS (
           |  SELECT doc_id, lang,
           |    unnest(generate_series(1, rep)) AS copy
           |  FROM r)
           |SELECT lang, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           |  CAST(COUNT(*) AS BIGINT) AS n_copies,
           |  CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT doc_id) AS ratio,
           |  CAST(SUM(doc_id * copy) AS BIGINT) AS checksum
           |FROM c GROUP BY lang ORDER BY lang""".stripMargin))

  // A trained quality classifier applied at scale — the fastText-style
  // filter stage, as a LINEAR margin over the engine's quality features.
  // Deliberately no sigmoid: exp() is libm-dependent across engines, the
  // logit margin is pure IEEE mul/add with pinned association, so the
  // scores hash-match exactly. keep ⇔ margin > 0 (same decision boundary).
  // Oracle literals are ::DOUBLE-pinned — a bare 0.01 parses as DECIMAL
  // in DuckDB and the mixed decimal/double tree drifts by an ulp.
  private val qualityMargin = Q(
    "q_quality_margin",
    (s, dir) => {
      val m = TextStats.qualityMetrics(t(s, dir, "documents"), "doc_id", "text")
      m.select(col("doc_id"),
          (((lit(-2.0) + lit(0.01) * col("n_tokens"))
            + lit(4.0) * col("stop_ratio"))
            + lit(-0.5) * col("avg_token_len")).as("margin"))
        .withColumn("keep", col("margin") > 0)
        .orderBy("doc_id")
    },
    Some("""WITH f AS (
           |  SELECT doc_id, len(toks) AS n_tokens,
           |    CAST(len(list_filter(toks, t -> t IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
           |      / nullif(len(toks), 0) AS stop_ratio,
           |    CAST(length(replace(text, ' ', '')) AS DOUBLE)
           |      / nullif(len(toks), 0) AS avg_token_len
           |  FROM (SELECT doc_id, text,
           |          list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
           |        FROM documents))
           |SELECT doc_id,
           |  ((-2.0::DOUBLE + 0.01::DOUBLE * n_tokens) + 4.0::DOUBLE * stop_ratio)
           |    + (-0.5::DOUBLE) * avg_token_len AS margin,
           |  (((-2.0::DOUBLE + 0.01::DOUBLE * n_tokens) + 4.0::DOUBLE * stop_ratio)
           |    + (-0.5::DOUBLE) * avg_token_len) > 0 AS keep
           |FROM f ORDER BY doc_id""".stripMargin))

  // Deterministic per-epoch shuffle: every epoch gets its own content-hash
  // order (md5("epoch:doc_id")). Deliberately NO materialized row_number —
  // a per-epoch rank window would serialize each epoch through one
  // reducer; the hash IS the sort key, and a range-partitioned sort by
  // (epoch, shuffle_key) scales to any corpus. Training loaders consume
  // the order directly.
  private val shuffleEpoch = Q(
    "q_shuffle_epoch",
    (s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id")
      val epochs = s.range(0, 3).toDF("epoch")
      docs.crossJoin(broadcast(epochs))
        .withColumn("shuffle_key",
          md5(concat_ws(":", col("epoch"), col("doc_id"))))
        .select("epoch", "shuffle_key", "doc_id")
        .orderBy("epoch", "shuffle_key", "doc_id")
    },
    Some("""SELECT epoch, md5(CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)) AS shuffle_key,
           |  doc_id
           |FROM documents, (SELECT unnest(range(0, 3)) AS epoch) e
           |ORDER BY epoch, shuffle_key, doc_id""".stripMargin))

  // The corpus DATA CARD: the per-(lang, source) rollup a training run
  // records next to its artifacts — volume, token mass, quality pass
  // rate, length profile. One scan + one group-by; every figure integer
  // or decimal-exact so the card is reproducible anywhere.
  private val corpusReport = Q(
    "q_corpus_report",
    (s, dir) => {
      val m = TextStats.qualityMetrics(t(s, dir, "documents"), "doc_id", "text")
        .join(t(s, dir, "documents").select("doc_id", "lang", "source"), "doc_id")
      m.groupBy("lang", "source").agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens").cast("long")).as("total_tokens"),
          sum(when(col("is_quality"), 1L).otherwise(0L)).as("n_quality"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"),
          expr("sum(CAST(n_chars AS BIGINT)) DIV count(1)").as("mean_chars_floor"))
        .orderBy("lang", "source")
    },
    Some("""WITH f AS (
           |  SELECT doc_id, lang, source, length(text) AS n_chars,
           |    len(toks) AS n_tokens,
           |    (len(toks) BETWEEN 20 AND 10000)
           |      AND (CAST(len(list_filter(toks, t -> t IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
           |           / nullif(len(toks), 0) < 0.5) AS is_quality
           |  FROM (SELECT doc_id, lang, source, text,
           |          list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
           |        FROM documents))
           |SELECT lang, source, COUNT(*) AS n_docs,
           |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           |  CAST(SUM(CASE WHEN is_quality THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
           |  CAST(MIN(n_chars) AS INTEGER) AS min_chars,
           |  CAST(MAX(n_chars) AS INTEGER) AS max_chars,
           |  CAST(SUM(n_chars) AS BIGINT) // COUNT(*) AS mean_chars_floor
           |FROM f GROUP BY lang, source ORDER BY lang, source""".stripMargin))

  // Curriculum ordering (staged introduction): rank the corpus so easy
  // documents dominate early training and harder strata phase in as the
  // run progresses. Difficulty = n_chars quartile (exact interpolated
  // percentiles — the q_median-proven bit-exact pair with quantile_cont),
  // baked in-plan via a broadcast 1-row frame. Each doc's curriculum key
  // is its 60-bit content hash DELAYED by stratum·2⁵⁸: stratum s enters
  // the stream after s/4 of the easier hash space has played, then mixes
  // freely — exact BIGINT arithmetic on both engines (hash < 2⁶⁰,
  // max key < 2⁶² — no encoding cliff at any corpus size; cross-stratum
  // key collisions are broken by the doc_id tie column). The position
  // itself is a distributed prefix count (PrefixSum.runningSumsBy), NOT
  // `row_number() OVER (ORDER BY …)` — parallelism stays |ranges|, the
  // whole corpus never serializes through one sort task.
  private val curriculumOrder = Q(
    "q_curriculum_order",
    (s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id", "n_chars")
      val qs = docs.agg(
        expr("percentile(n_chars, 0.25D)").as("q25"),
        expr("percentile(n_chars, 0.5D)").as("q50"),
        expr("percentile(n_chars, 0.75D)").as("q75"))
      val staged = docs.crossJoin(broadcast(qs))
        .withColumn("stratum",
          (col("n_chars") > col("q25")).cast("int")
            + (col("n_chars") > col("q50")).cast("int")
            + (col("n_chars") > col("q75")).cast("int"))
        .withColumn("ckey",
          conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10).cast("long")
            + col("stratum").cast("long") * lit(1L << 58))
        .select(col("doc_id"), col("stratum"), col("ckey"), lit(0).as("__g"), lit(1L).as("__one"))
      PrefixSum.runningSumsBy(staged, "__g", "ckey", Seq("doc_id"),
          Seq("__one"), Seq("curriculum_pos"))
        .select("curriculum_pos", "doc_id", "stratum")
        .orderBy("curriculum_pos")
    },
    Some("""WITH q AS (
           |  SELECT CAST(quantile_cont(n_chars, 0.25) AS DOUBLE) AS q25,
           |    CAST(quantile_cont(n_chars, 0.5) AS DOUBLE) AS q50,
           |    CAST(quantile_cont(n_chars, 0.75) AS DOUBLE) AS q75
           |  FROM documents),
           |staged AS (
           |  SELECT doc_id,
           |    (CAST(n_chars > q25 AS INTEGER) + CAST(n_chars > q50 AS INTEGER)
           |      + CAST(n_chars > q75 AS INTEGER)) AS stratum,
           |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
           |      + CAST(CAST(n_chars > q25 AS INTEGER) + CAST(n_chars > q50 AS INTEGER)
           |          + CAST(n_chars > q75 AS INTEGER) AS BIGINT) * 288230376151711744 AS ckey
           |  FROM documents, q)
           |SELECT ROW_NUMBER() OVER (ORDER BY ckey, doc_id) AS curriculum_pos,
           |  doc_id, stratum
           |FROM staged ORDER BY curriculum_pos""".stripMargin))

  val all: Seq[Q] = Seq(packSequences, vocabBuild, unigramTrain, unigramSegment,
    splitAssign, balanceLangs,
    packGlobal, chunkDocs, interleaveMix, textToIds, sourceCap, tokenBudget,
    mixTemperature, upsampleMix, mixtureReweight, mixtureAllocate, qualityMargin, shuffleEpoch,
    curriculumOrder, corpusReport)
}
