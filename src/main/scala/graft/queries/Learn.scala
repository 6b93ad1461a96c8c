package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ext.{Curation, Dedup, Retrieval}
import graft.ops.{HistSketch, LinearFit}
import QueryUtil._

/**
 * Corpus model-fitting and tuning-diagnostic queries (SURVEY.md §2.4):
 * the steps that SET the policy constants the curation operators consume —
 * fit a linear corpus model (the fit-side twin of `q_quality_margin`'s
 * applied margin), serve quantiles from a mergeable histogram sketch (the
 * monitoring state that picks filter cutoffs), sweep the dedup threshold
 * before committing to one, census cross-source n-gram overlap, and prove
 * the chunk→vectorize→retrieve composite runs as one lazy plan.
 */
object Learn {

  /** DuckDB-side integer feature frame shared by the fit oracle: y =
    * n_chars, x1 = token count, x2 = distinct token count. */
  private val featsCte =
    """f AS (
      |  SELECT CAST(n_chars AS DECIMAL(18,0)) AS y,
      |    CAST(len(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS DECIMAL(18,0)) AS x1,
      |    CAST(len(list_distinct(list_filter(string_split(lower(text), ' '), x -> x <> ''))) AS DECIMAL(18,0)) AS x2
      |  FROM documents)""".stripMargin

  // OLS fit of n_chars ~ tokens + distinct tokens over the whole corpus:
  // ten exact decimal sufficient statistics (ONE row shuffles), Cramer's
  // rule as a pinned IEEE tree in the same plan. The oracle replays the
  // identical cofactor expansion — hash match proves the distributed fit
  // is bit-identical to a sequential one.
  private val linregFit = Q(
    "q_linreg_fit",
    (s, dir) => {
      val toks = graft.ext.TextStats.tokens(col("text"))
      LinearFit.fitOls2(
        t(s, dir, "documents").select(
          col("n_chars").as("y"),
          size(toks).as("x1"),
          size(array_distinct(toks)).as("x2")),
        "y", "x1", "x2")
        .orderBy("coef")
    },
    Some(s"""WITH $featsCte,
            |s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
            |  CAST(SUM(x1) AS DOUBLE) AS sx1, CAST(SUM(x2) AS DOUBLE) AS sx2,
            |  CAST(SUM(y) AS DOUBLE) AS sy,
            |  CAST(SUM(x1*x1) AS DOUBLE) AS sx1x1, CAST(SUM(x1*x2) AS DOUBLE) AS sx1x2,
            |  CAST(SUM(x2*x2) AS DOUBLE) AS sx2x2,
            |  CAST(SUM(x1*y) AS DOUBLE) AS sx1y, CAST(SUM(x2*y) AS DOUBLE) AS sx2y,
            |  CAST(SUM(y*y) AS DOUBLE) AS syy FROM f),
            |d AS (SELECT *,
            |  n*(sx1x1*sx2x2 - sx1x2*sx1x2) - sx1*(sx1*sx2x2 - sx1x2*sx2)
            |    + sx2*(sx1*sx1x2 - sx1x1*sx2) AS det FROM s),
            |b AS (SELECT *,
            |  (sy*(sx1x1*sx2x2 - sx1x2*sx1x2) - sx1*(sx1y*sx2x2 - sx1x2*sx2y)
            |    + sx2*(sx1y*sx1x2 - sx1x1*sx2y)) / det AS b0,
            |  (n*(sx1y*sx2x2 - sx1x2*sx2y) - sy*(sx1*sx2x2 - sx1x2*sx2)
            |    + sx2*(sx1*sx2y - sx1y*sx2)) / det AS b1,
            |  (n*(sx1x1*sx2y - sx1y*sx1x2) - sx1*(sx1*sx2y - sx1y*sx2)
            |    + sy*(sx1*sx1x2 - sx1x1*sx2)) / det AS b2 FROM d)
            |SELECT coef, value FROM (
            |  SELECT 'b0' AS coef, b0 AS value FROM b
            |  UNION ALL SELECT 'b1', b1 FROM b
            |  UNION ALL SELECT 'b2', b2 FROM b
            |  UNION ALL SELECT 'r2',
            |    1.0 - (syy - (b0*sy + b1*sx1y + b2*sx2y)) / (syy - sy*sy/n) FROM b)
            |ORDER BY coef""".stripMargin))

  // Per-language models from ONE aggregate — the "thousands of
  // per-stratum models in one corpus pass" shape; same cofactor tree as
  // the global fit, one 10-decimal row per group shuffles.
  private val linregByLang = Q(
    "q_linreg_by_lang",
    (s, dir) => {
      val toks = graft.ext.TextStats.tokens(col("text"))
      LinearFit.fitOls2(
        t(s, dir, "documents").select(
          col("lang"),
          col("n_chars").as("y"),
          size(toks).as("x1"),
          size(array_distinct(toks)).as("x2")),
        "y", "x1", "x2", groupCols = Seq("lang"))
        .orderBy("lang", "coef")
    },
    Some(s"""WITH f AS (
            |  SELECT lang, CAST(n_chars AS DECIMAL(18,0)) AS y,
            |    CAST(len(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS DECIMAL(18,0)) AS x1,
            |    CAST(len(list_distinct(list_filter(string_split(lower(text), ' '), x -> x <> ''))) AS DECIMAL(18,0)) AS x2
            |  FROM documents),
            |s AS (SELECT lang, CAST(COUNT(*) AS DOUBLE) AS n,
            |  CAST(SUM(x1) AS DOUBLE) AS sx1, CAST(SUM(x2) AS DOUBLE) AS sx2,
            |  CAST(SUM(y) AS DOUBLE) AS sy,
            |  CAST(SUM(x1*x1) AS DOUBLE) AS sx1x1, CAST(SUM(x1*x2) AS DOUBLE) AS sx1x2,
            |  CAST(SUM(x2*x2) AS DOUBLE) AS sx2x2,
            |  CAST(SUM(x1*y) AS DOUBLE) AS sx1y, CAST(SUM(x2*y) AS DOUBLE) AS sx2y,
            |  CAST(SUM(y*y) AS DOUBLE) AS syy FROM f GROUP BY lang),
            |d AS (SELECT *,
            |  n*(sx1x1*sx2x2 - sx1x2*sx1x2) - sx1*(sx1*sx2x2 - sx1x2*sx2)
            |    + sx2*(sx1*sx1x2 - sx1x1*sx2) AS det FROM s),
            |b AS (SELECT *,
            |  (sy*(sx1x1*sx2x2 - sx1x2*sx1x2) - sx1*(sx1y*sx2x2 - sx1x2*sx2y)
            |    + sx2*(sx1y*sx1x2 - sx1x1*sx2y)) / det AS b0,
            |  (n*(sx1y*sx2x2 - sx1x2*sx2y) - sy*(sx1*sx2x2 - sx1x2*sx2)
            |    + sx2*(sx1*sx2y - sx1y*sx2)) / det AS b1,
            |  (n*(sx1x1*sx2y - sx1y*sx1x2) - sx1*(sx1*sx2y - sx1y*sx2)
            |    + sy*(sx1*sx1x2 - sx1x1*sx2)) / det AS b2 FROM d)
            |SELECT lang, coef, value FROM (
            |  SELECT lang, 'b0' AS coef, b0 AS value FROM b
            |  UNION ALL SELECT lang, 'b1', b1 FROM b
            |  UNION ALL SELECT lang, 'b2', b2 FROM b
            |  UNION ALL SELECT lang, 'r2',
            |    1.0 - (syy - (b0*sy + b1*sx1y + b2*sx2y)) / (syy - sy*sy/n) FROM b)
            |ORDER BY lang, coef""".stripMargin))

  // Power-law (scaling-law) fit per source: ln(chars) = a + b·ln(tokens).
  // Real-valued features through the 9-dp ln contract; products rounded
  // into DECIMAL(28,12) so the sums stay exact and order-independent.
  private val powerlawFit = Q(
    "q_powerlaw_fit",
    (s, dir) => {
      val toks = graft.ext.TextStats.tokens(col("text"))
      LinearFit.fitPowerLaw(
        t(s, dir, "documents").select(
          col("source"), col("n_chars").as("y"), size(toks).as("x")),
        "y", "x", groupCols = Seq("source"))
        .orderBy("source")
    },
    Some("""WITH f AS (
           |  SELECT source,
           |    round(ln(CAST(len(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS DOUBLE)), 9) AS lx,
           |    round(ln(CAST(n_chars AS DOUBLE)), 9) AS ly
           |  FROM documents
           |  WHERE len(list_filter(string_split(lower(text), ' '), x -> x <> '')) > 0
           |    AND n_chars > 0),
           |s AS (SELECT source, CAST(COUNT(*) AS DOUBLE) AS n,
           |  CAST(SUM(CAST(lx AS DECIMAL(28,12))) AS DOUBLE) AS sx,
           |  CAST(SUM(CAST(ly AS DECIMAL(28,12))) AS DOUBLE) AS sy,
           |  CAST(SUM(CAST(round(lx*lx, 9) AS DECIMAL(28,12))) AS DOUBLE) AS sxx,
           |  CAST(SUM(CAST(round(lx*ly, 9) AS DECIMAL(28,12))) AS DOUBLE) AS sxy
           |  FROM f GROUP BY 1)
           |SELECT source, (sy - b*sx)/n AS a, b, n FROM (
           |  SELECT *, (n*sxy - sx*sy) / (n*sxx - sx*sx) AS b FROM s)
           |ORDER BY source""".stripMargin))

  // Mergeable histogram-sketch quantiles over events.value per type:
  // [0,500) in 50 bins, nearest-rank targets, in-bin interpolation. The
  // oracle replays binning + serving — hash match on APPROXIMATE
  // estimates, like the KMV/CMS queries. Split-merge ≡ one-pass is
  // HistSketchSpec's property.
  private val quantileSketch = Q(
    "q_quantile_sketch",
    (s, dir) => {
      val state = HistSketch.buildState(
        events(s, dir), Seq("event_type"), "value", lo = 0.0, hi = 500.0, bins = 50)
      HistSketch.quantiles(state, Seq("event_type"), Seq(0.5, 0.9, 0.99),
        lo = 0.0, hi = 500.0, bins = 50)
        .orderBy("event_type", "q")
    },
    Some("""WITH st AS (
           |  SELECT event_type,
           |    least(greatest(CAST(floor((CAST(value AS DOUBLE) - 0.0) / 10.0) AS BIGINT), 0), 49) AS bin,
           |    COUNT(*) AS cnt
           |  FROM events GROUP BY 1, 2),
           |cum AS (
           |  SELECT event_type, bin, cnt,
           |    CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n,
           |    CAST(COALESCE(SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
           |  FROM st),
           |wq AS (
           |  SELECT c.*, q.q,
           |    least(greatest(CAST(ceil(q.q * c.n) AS BIGINT), 1), c.n) AS target
           |  FROM cum c CROSS JOIN (SELECT CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS q) q)
           |SELECT event_type, q,
           |  0.0 + 10.0 * (CAST(bin AS DOUBLE) +
           |    CAST(target - cum_before AS DOUBLE) / CAST(cnt AS DOUBLE)) AS est
           |FROM wq
           |WHERE cum_before < target AND target <= cum_before + cnt
           |ORDER BY event_type, q""".stripMargin))

  // Dedup threshold sweep: pair set computed once at the loosest cutoff,
  // each candidate threshold's (pairs fired, docs dropped) from one
  // explode over it. Oracle recomputes the full curve from the naive
  // shingle join.
  private val dedupSweep = Q(
    "q_dedup_sweep",
    (s, dir) => Dedup.thresholdSweep(
      t(s, dir, "documents"), "doc_id", "text",
      thresholds = Seq(0.3, 0.5, 0.7, 0.8, 0.9), n = 3)
      .orderBy("threshold"),
    Some("""WITH sh AS (
           |  SELECT doc_id, unnest(list_distinct(list_transform(range(0, len(toks)-2),
           |    i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))) AS shingle
           |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents)
           |  WHERE len(toks) >= 3),
           |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
           |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
           |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           |          GROUP BY 1, 2),
           |pairs AS (
           |  SELECT d1, d2, CAST(i AS DOUBLE)/(s1.sz + s2.sz - i) AS jaccard
           |  FROM inter
           |  JOIN sizes s1 ON s1.doc_id = d1
           |  JOIN sizes s2 ON s2.doc_id = d2
           |  WHERE CAST(i AS DOUBLE)/(s1.sz + s2.sz - i) >= 0.3),
           |th AS (SELECT CAST(unnest([0.3, 0.5, 0.7, 0.8, 0.9]) AS DOUBLE) AS threshold),
           |fired AS (
           |  SELECT t.threshold, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           |         CAST(COUNT(DISTINCT d2) AS BIGINT) AS n_docs_dropped
           |  FROM th t JOIN pairs p ON p.jaccard >= t.threshold GROUP BY 1)
           |SELECT t.threshold,
           |  CAST(COALESCE(n_pairs, 0) AS BIGINT) AS n_pairs,
           |  CAST(COALESCE(n_docs_dropped, 0) AS BIGINT) AS n_docs_dropped
           |FROM th t LEFT JOIN fired USING (threshold)
           |ORDER BY threshold""".stripMargin))

  // Cross-source 5-gram containment census. Shuffle is Σ per-gram
  // source-pairs — bounded by |grams|·|sources|², never documents².
  private val sourceOverlap = Q(
    "q_source_overlap",
    (s, dir) => Curation.sourceOverlap(
      t(s, dir, "documents"), "source", "text", n = 5)
      .orderBy("src_a", "src_b"),
    Some("""WITH toks AS (SELECT source, string_split(lower(text), ' ') AS t FROM documents),
           |g AS (SELECT DISTINCT source AS src, gram FROM (
           |        SELECT source, unnest(list_transform(range(0, len(t)-4),
           |          i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4] || ' ' || t[i+5])) AS gram
           |        FROM toks WHERE len(t) >= 5)),
           |sizes AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS grams_a FROM g GROUP BY 1),
           |shared AS (SELECT a.src AS src_a, b.src AS src_b, CAST(COUNT(*) AS BIGINT) AS shared
           |           FROM g a JOIN g b USING (gram) WHERE a.src <> b.src GROUP BY 1, 2)
           |SELECT src_a, src_b, grams_a, shared,
           |  CAST(shared AS DOUBLE) / CAST(grams_a AS DOUBLE) AS containment
           |FROM shared JOIN sizes ON sizes.src = shared.src_a
           |ORDER BY src_a, src_b""".stripMargin))

  // The RAG composite: chunk → hash-vectorize → score against the
  // corpus-derived query → top-5, one lazy plan end to end. The oracle
  // replays chunking (integer window arithmetic), the md5 bucket space,
  // and the pinned cosine tree.
  private val ragRetrieve = Q(
    "q_rag_retrieve",
    (s, dir) => Retrieval.retrieveTopK(
      t(s, dir, "documents"), "doc_id", "text",
      budget = 32, dim = 1024, qTokens = 3, k = 5),
    Some("""WITH toks AS (
           |  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS ts
           |  FROM documents),
           |chunks AS (
           |  SELECT doc_id, unnest(generate_series(0, (len(ts) + 31) // 32 - 1)) AS chunk_id, ts
           |  FROM toks WHERE len(ts) > 0),
           |ch AS (
           |  SELECT doc_id, chunk_id,
           |    CAST(least(32, len(ts) - chunk_id * 32) AS BIGINT) AS chunk_tokens,
           |    list_slice(ts, chunk_id * 32 + 1, chunk_id * 32 + 32) AS ctoks
           |  FROM chunks),
           |f AS (
           |  SELECT doc_id, chunk_id, chunk_tokens,
           |    ('0x' || substr(md5(tok), 1, 15))::BIGINT % 1024 AS bucket,
           |    CAST(COUNT(*) AS BIGINT) AS cnt
           |  FROM (SELECT doc_id, chunk_id, chunk_tokens, unnest(ctoks) AS tok FROM ch)
           |  GROUP BY 1, 2, 3, 4),
           |norms AS (SELECT doc_id, chunk_id, chunk_tokens,
           |            CAST(SUM(cnt * cnt) AS BIGINT) AS nc
           |          FROM f GROUP BY 1, 2, 3),
           |qtok AS (SELECT tok FROM (
           |           SELECT unnest(ts) AS tok FROM toks)
           |         GROUP BY tok ORDER BY COUNT(*) DESC, tok LIMIT 3),
           |qb AS (SELECT ('0x' || substr(md5(tok), 1, 15))::BIGINT % 1024 AS bucket,
           |              CAST(COUNT(*) AS BIGINT) AS qcnt
           |       FROM qtok GROUP BY 1),
           |qn AS (SELECT CAST(SUM(qcnt * qcnt) AS BIGINT) AS nq FROM qb),
           |dots AS (SELECT doc_id, chunk_id, CAST(SUM(cnt * qcnt) AS BIGINT) AS dot
           |         FROM f JOIN qb USING (bucket) GROUP BY 1, 2)
           |SELECT d.doc_id, d.chunk_id, n.chunk_tokens,
           |  CAST(dot AS DOUBLE) / (sqrt(CAST(nc AS DOUBLE)) * sqrt(CAST(nq AS DOUBLE))) AS cos
           |FROM dots d
           |JOIN norms n ON n.doc_id = d.doc_id AND n.chunk_id = d.chunk_id
           |CROSS JOIN qn
           |ORDER BY cos DESC, d.doc_id, d.chunk_id LIMIT 5""".stripMargin))

  // Poisson bootstrap (Chamandy et al., "Estimating Uncertainty for
  // Massive Data Streams", Google 2012): the distributed way to get a
  // CI on a corpus statistic — true resampling needs sampling WITHOUT
  // replacement across partitions, Poisson(1) weights need only a local
  // draw per (row, replica). Determinism design: the draw is an md5-60bit
  // integer compared against PRE-INTEGERIZED Poisson CDF thresholds
  // (⌊cdf·2^60⌋ Long literals baked into both plans at authoring time),
  // so no float comparison and no engine RNG anywhere; replica means are
  // exact-decimal weighted sums with ONE final IEEE division. Scale
  // shape: explode ×B then ONE map-side-combined aggregate — B counters
  // per partition cross the wire; the CI is a trivial driver-side
  // quantile over B rows downstream.
  private val bootstrapMeans = Q(
    "q_bootstrap_means",
    (s, dir) => {
      val B = 32
      // Poisson(1) CDF at k = 0..4, integerized to 60-bit thresholds;
      // weights cap at 5 (covers 99.96% of the mass, deterministic).
      val cdf = {
        var acc = 0.0; var fact = 1.0
        (0 to 4).map { k =>
          if (k > 0) fact *= k
          acc += math.exp(-1.0) / fact
          (acc * math.pow(2, 60)).toLong
        }
      }
      val u = conv(substring(md5(concat(
          col("replica").cast("string"), lit(":"), col("o_orderkey").cast("string"))),
          1, 15), 16, 10).cast("long")
      val w = cdf.map(c => when(u > lit(c), 1L).otherwise(0L)).reduce(_ + _)
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"),
          explode(sequence(lit(0), lit(B - 1))).as("replica"))
        .withColumn("w", w)
        .groupBy("replica")
        .agg(sum(col("w")).as("n_eff"),
          (sum(col("w") * col("o_totalprice").cast(DecimalType(18, 2)))
            .cast("double") / sum(col("w"))).as("mean_rev"))
        .select(col("replica").cast("int").as("replica"), col("n_eff"), col("mean_rev"))
        .orderBy("replica")
    },
    Some {
      val cdf = {
        var acc = 0.0; var fact = 1.0
        (0 to 4).map { k =>
          if (k > 0) fact *= k
          acc += math.exp(-1.0) / fact
          (acc * math.pow(2, 60)).toLong
        }
      }
      val wExpr = cdf.map(c => s"(CASE WHEN u > $c THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH e AS (
         |  SELECT o_orderkey, o_totalprice, r.replica
         |  FROM orders, (SELECT unnest(range(0, 32)) AS replica) r),
         |h AS (
         |  SELECT replica, o_totalprice,
         |    ('0x' || substr(md5(CAST(replica AS VARCHAR) || ':'
         |      || CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT AS u
         |  FROM e),
         |w AS (SELECT replica, o_totalprice, $wExpr AS w FROM h)
         |SELECT CAST(replica AS INTEGER) AS replica,
         |  CAST(SUM(w) AS BIGINT) AS n_eff,
         |  CAST(SUM(w * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         |    / CAST(SUM(w) AS BIGINT) AS mean_rev
         |FROM w GROUP BY replica ORDER BY replica""".stripMargin
    })

  val all: Seq[Q] = Seq(linregFit, linregByLang, powerlawFit, quantileSketch,
    dedupSweep, sourceOverlap, ragRetrieve, bootstrapMeans)
}
