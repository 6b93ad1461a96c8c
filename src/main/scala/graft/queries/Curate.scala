package graft.queries

import org.apache.spark.sql.functions._

import graft.ext.{Curation, SimSearch}
import QueryUtil._

/**
 * Web-corpus curation queries (SURVEY.md §2.4): the published
 * crawl-to-corpus cleanup steps — Gopher repetition signals,
 * corpus-frequent-n-gram boilerplate removal, SemDeDup, DSIR importance
 * weights — each over the driver's `documents` / `embeddings` fixtures
 * with a full-replay DuckDB oracle (every fraction is one IEEE division
 * of exact integer counts; the one transcendental goes through the repo's
 * 9-dp `ln` rounding contract).
 */
object Curate {

  /** Shared DuckDB token CTE: positions are 0-based like Spark's
    * posexplode; DuckDB lists are 1-indexed, hence the +1s. */
  private val toksCte =
    """toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents)"""

  private def gramList(n: Int): String = {
    val parts = (1 to n).map(j => s"t[i+$j]").mkString(" || ' ' || ")
    s"list_transform(range(0, len(t)-${n - 1}), i -> $parts)"
  }

  private val gopherRepetition = Q(
    "q_gopher_repetition",
    (s, dir) => Curation.gopherRepetition(t(s, dir, "documents"))
      .orderBy("doc_id"),
    Some(s"""WITH $toksCte,
            |words AS (SELECT doc_id, len(t) AS n_words, len(list_distinct(t)) AS n_dist FROM toks),
            |bi AS (SELECT doc_id, unnest(${gramList(2)}) AS g FROM toks WHERE len(t) >= 2),
            |bic AS (SELECT doc_id, g, COUNT(*) AS c FROM bi GROUP BY 1, 2),
            |bia AS (SELECT doc_id, CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS topf
            |        FROM bic GROUP BY 1),
            |tri AS (SELECT doc_id, unnest(${gramList(3)}) AS g FROM toks WHERE len(t) >= 3),
            |tric AS (SELECT doc_id, g, COUNT(*) AS c FROM tri GROUP BY 1, 2),
            |tria AS (SELECT doc_id,
            |           CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS DOUBLE)
            |             / CAST(SUM(c) AS DOUBLE) AS dupf
            |         FROM tric GROUP BY 1)
            |SELECT w.doc_id, CAST(n_words AS BIGINT) AS n_words,
            |  CAST(n_words - n_dist AS DOUBLE) / CAST(n_words AS DOUBLE) AS dup_word_frac,
            |  COALESCE(topf, 0.0) AS top_bigram_frac,
            |  COALESCE(dupf, 0.0) AS dup_trigram_frac
            |FROM words w LEFT JOIN bia USING (doc_id) LEFT JOIN tria USING (doc_id)
            |ORDER BY doc_id""".stripMargin))

  private val boilerplateNgrams = Q(
    "q_boilerplate_ngrams",
    (s, dir) => Curation.frequentNgrams(t(s, dir, "documents"), n = 5, minDocs = 2)
      .orderBy("gram"),
    Some(s"""WITH $toksCte,
            |g AS (SELECT DISTINCT doc_id, gram FROM (
            |        SELECT doc_id, unnest(${gramList(5)}) AS gram
            |        FROM toks WHERE len(t) >= 5))
            |SELECT gram, CAST(COUNT(*) AS BIGINT) AS doc_freq
            |FROM g GROUP BY gram HAVING COUNT(*) >= 2
            |ORDER BY gram""".stripMargin))

  private val boilerplateScrub = Q(
    "q_boilerplate_scrub",
    (s, dir) => Curation.scrubFrequentNgrams(t(s, dir, "documents"), n = 5, minDocs = 2)
      .orderBy("doc_id"),
    Some(s"""WITH $toksCte,
            |pt AS (SELECT doc_id, unnest(t) AS tok, unnest(range(0, len(t))) AS pos FROM toks),
            |pg AS (SELECT doc_id, unnest(${gramList(5)}) AS gram,
            |         unnest(range(0, len(t)-4)) AS pos
            |       FROM toks WHERE len(t) >= 5),
            |freq AS (SELECT gram FROM (SELECT DISTINCT doc_id, gram FROM pg)
            |         GROUP BY gram HAVING COUNT(*) >= 2),
            |cov AS (SELECT DISTINCT p.doc_id, p.pos + o.o AS pos
            |        FROM pg p JOIN freq USING (gram)
            |        CROSS JOIN (SELECT unnest(range(0, 5)) AS o) o),
            |kept AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
            |           string_agg(tok, ' ' ORDER BY pos) AS text_clean
            |         FROM pt WHERE NOT EXISTS (
            |           SELECT 1 FROM cov WHERE cov.doc_id = pt.doc_id AND cov.pos = pt.pos)
            |         GROUP BY doc_id)
            |SELECT d.doc_id, COALESCE(n_kept, 0) AS n_kept,
            |  COALESCE(text_clean, '') AS text_clean
            |FROM documents d LEFT JOIN kept ON d.doc_id = kept.doc_id
            |ORDER BY d.doc_id""".stripMargin))

  // SemDeDup over the same deterministic k-means the IVF oracle replays:
  // the shared a1 CTE IS the engine's ivfAssign output, so the oracle
  // hash-checks cluster membership AND the within-cluster cosine verdicts.
  private val semDedup = Q(
    "q_semdedup",
    (s, dir) => Curation.semDedup(t(s, dir, "embeddings"), tau = 0.4, k = 16)
      .select(col("vec_id"), col("cluster"), col("keep").cast("int").as("keep"))
      .orderBy("vec_id"),
    Some(s"""WITH ${Extensions.ivfA1Ctes},
            |drops AS (SELECT DISTINCT b.neighbor_id AS id
            |  FROM a1 a JOIN a1 b
            |    ON a.cluster = b.cluster AND a.neighbor_id < b.neighbor_id
            |  WHERE list_dot_product(a.cvec, b.cvec) /
            |    (sqrt(list_dot_product(a.cvec, a.cvec)) *
            |     sqrt(list_dot_product(b.cvec, b.cvec))) >= 0.4)
            |SELECT a1.neighbor_id AS vec_id, CAST(cluster AS INTEGER) AS cluster,
            |  CAST(CASE WHEN d.id IS NULL THEN 1 ELSE 0 END AS INTEGER) AS keep
            |FROM a1 LEFT JOIN drops d ON a1.neighbor_id = d.id
            |ORDER BY vec_id""".stripMargin))

  private val dsirWeights = Q(
    "q_dsir_weights",
    (s, dir) => Curation.dsirWeights(
      t(s, dir, "documents"), col("source") === "src0")
      .orderBy("doc_id"),
    Some("""WITH toks AS (SELECT doc_id, source = 'src0' AS is_target,
           |                unnest(string_split(lower(text), ' ')) AS tok
           |              FROM documents),
           |counts AS (SELECT tok,
           |             CAST(SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS ct,
           |             CAST(COUNT(*) AS BIGINT) AS cc
           |           FROM toks GROUP BY tok),
           |tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS nt, CAST(SUM(cc) AS BIGINT) AS nc,
           |          CAST(COUNT(*) AS BIGINT) AS vocab FROM counts),
           |ratios AS (SELECT tok,
           |             round(ln((CAST(ct + 1 AS DOUBLE) * CAST(nc + vocab AS DOUBLE))
           |               / (CAST(cc + 1 AS DOUBLE) * CAST(nt + vocab AS DOUBLE))), 9) AS lr
           |           FROM counts CROSS JOIN tot)
           |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           |  CAST(SUM(CAST(lr AS DECIMAL(28, 12))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
           |    AS dsir_weight
           |FROM toks JOIN ratios USING (tok)
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  // Contrastive hard negatives: most-similar DIFFERENT-label vectors.
  private val hardNegatives = Q(
    "q_hard_negatives",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      SimSearch.hardNegatives(emb, emb.filter(col("vec_id") < 10), k = 5)
        .orderBy("query_id", "rank")
    },
    Some("""WITH q AS (SELECT vec_id AS query_id, label AS ql, embedding::DOUBLE[] AS qv
           |           FROM embeddings WHERE vec_id < 10),
           |c AS (SELECT vec_id AS neighbor_id, label AS nl, embedding::DOUBLE[] AS cv
           |      FROM embeddings)
           |SELECT query_id, rank, neighbor_id, sim FROM (
           |  SELECT query_id, neighbor_id,
           |    list_dot_product(qv, cv)/(sqrt(list_dot_product(qv, qv))*sqrt(list_dot_product(cv, cv))) AS sim,
           |    CAST(row_number() OVER (PARTITION BY query_id
           |      ORDER BY list_dot_product(qv, cv)/(sqrt(list_dot_product(qv, qv))*sqrt(list_dot_product(cv, cv))) DESC,
           |        neighbor_id) AS INTEGER) AS rank
           |  FROM q JOIN c ON ql <> nl)
           |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin))

  // k-anonymity release gate: quasi-identifier combinations carried by
  // fewer than k docs are suppressed to '*'.
  private val kAnon = Q(
    "q_kanon",
    (s, dir) => Curation.kAnonymize(
      t(s, dir, "documents").select("doc_id", "lang", "source"),
      Seq("lang", "source"), k = 8)
      .orderBy("doc_id"),
    Some("""WITH n AS (SELECT lang, source, COUNT(*) AS c FROM documents GROUP BY 1, 2)
           |SELECT doc_id,
           |  CASE WHEN c >= 8 THEN d.lang ELSE '*' END AS lang,
           |  CASE WHEN c >= 8 THEN d.source ELSE '*' END AS source
           |FROM documents d JOIN n ON d.lang = n.lang AND d.source = n.source
           |ORDER BY doc_id""".stripMargin))

  // Within-document repetition SCRUB — the fix-side of the Gopher
  // repetition SIGNALS (q_gopher_repetition measures, this removes):
  // the token stream cuts into consecutive 2-token blocks, duplicate
  // blocks within the same document drop keep-first, survivors
  // reassemble in order. Block hashing turns the scrub into an exact
  // doc-partitioned window (shuffle ∝ blocks, state ∝ doc length —
  // never substring search), and the md5 of the reassembled stream
  // proves byte-exact reconstruction against the oracle.
  private val docRepScrub = Q(
    "q_doc_rep_scrub",
    (s, dir) => {
      val B = 2
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id", "bh").orderBy("bi")
      t(s, dir, "documents")
        .select(col("doc_id"), graft.ext.TextStats.tokens(col("text")).as("tk"))
        .filter(size(col("tk")) > 0)
        .select(col("doc_id"),
          posexplode(transform(
            sequence(lit(0),
              (ceil(size(col("tk")).cast("double") / B) - 1).cast("int")),
            i => slice(col("tk"), i * B + 1, lit(B)))).as(Seq("bi", "block")))
        .withColumn("bh", md5(concat_ws(" ", col("block"))))
        .withColumn("keep", row_number().over(w) === 1)
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_blocks"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("keep"), size(col("block"))).otherwise(0))
            .cast("long").as("n_tokens_kept"),
          md5(concat_ws(" ", flatten(transform(
            array_sort(collect_list(when(col("keep"),
              struct(col("bi"), col("block"))))),
            _.getField("block"))))).as("clean_fp"))
        .orderBy("doc_id")
    },
    Some("""WITH tk AS (
           |  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
           |  FROM documents),
           |b AS (
           |  SELECT doc_id, i AS bi, list_slice(t, i*2+1, i*2+2) AS block
           |  FROM (SELECT doc_id, t,
           |          unnest(range(0, CAST(ceil(len(t)/2.0) AS BIGINT))) AS i
           |        FROM tk WHERE len(t) > 0)),
           |k AS (
           |  SELECT doc_id, bi, block,
           |    row_number() OVER (PARTITION BY doc_id, md5(array_to_string(block, ' '))
           |      ORDER BY bi) = 1 AS keep
           |  FROM b)
           |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_blocks,
           |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           |  CAST(SUM(CASE WHEN keep THEN len(block) ELSE 0 END) AS BIGINT) AS n_tokens_kept,
           |  md5(array_to_string(flatten(list(block ORDER BY bi) FILTER (WHERE keep)), ' '))
           |    AS clean_fp
           |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  // URL canonicalization + registered-domain curation (UrlOps): one
  // deterministic synthetic URL per doc (scheme/subdomain/port/tracking
  // -param/fragment variation from the md5 twin), normalized by the
  // 6-rule chain, registered domain via the two-label-suffix rule,
  // blocklisted domains anti-joined away, then per-domain URL stats
  // (count, DISTINCT normalized URLs, lexicographic min). The oracle
  // replays every regex rule in RE2 — a hash match proves the two
  // engines' regex semantics agree on the whole chain, not just on
  // counts. Zero UDFs: the chain is codegen'd string expressions.
  private val urlCurate = Q(
    "q_url_curate",
    (s, dir) => {
      val id = col("doc_id")
      val hex = md5(id.cast("string"))
      val scheme = when(id % 3 === 1, "HTTP://").otherwise("https://")
      val sub = when(id % 4 === 1, "a.").when(id % 4 === 2, "b.c.")
        .when(id % 4 === 3, "www.").otherwise("")
      val base = concat(lit("d"), substring(hex, 1, 2))
      val tld = when(id % 5 === 0, ".com").when(id % 5 === 1, ".org")
        .when(id % 5 === 2, ".net").when(id % 5 === 3, ".co.uk")
        .otherwise(".ac.uk")
      val port = when(id % 11 === 0, ":443").when(id % 13 === 0, ":8080")
        .otherwise("")
      val path = concat(lit("/P/"), substring(hex, 3, 3))
      val trail = when(id % 6 === 0, "/").otherwise("")
      val qs = when(id % 7 === 0,
          concat(lit("?utm_source=feed&x="), substring(hex, 6, 2)))
        .when(id % 7 === 1,
          concat(lit("?x="), substring(hex, 6, 2), lit("&utm_campaign=z")))
        .when(id % 7 === 2, lit("?utm_only=1"))
        .otherwise("")
      val frag = when(id % 2 === 0, concat(lit("#s"), substring(hex, 8, 1)))
        .otherwise("")
      val urls = t(s, dir, "documents").select(id.as("id"),
        concat(scheme, sub, base, tld, port, path, trail, qs, frag).as("url"))
      val withDom = urls
        .withColumn("norm", graft.ext.UrlOps.normalizeUrl(col("url")))
        .withColumn("domain", graft.ext.UrlOps.registeredDomainOf(
          graft.ext.UrlOps.hostOf(col("norm")), Seq("co.uk", "ac.uk")))
      import s.implicits._
      val blocklist = Seq("d0a.com", "d1b.org", "d2c.net", "d3d.co.uk",
        "d4e.ac.uk", "dff.com").toDF("domain")
      withDom.join(broadcast(blocklist), Seq("domain"), "left_anti")
        .groupBy("domain")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("norm")).as("n_unique"),
          min(col("norm")).as("min_url"))
        .orderBy("domain")
    },
    Some("""WITH d AS (SELECT doc_id AS id, md5(CAST(doc_id AS VARCHAR)) AS hex FROM documents),
           |u AS (SELECT id,
           |  (CASE WHEN id % 3 = 1 THEN 'HTTP://' ELSE 'https://' END)
           |  || (CASE id % 4 WHEN 1 THEN 'a.' WHEN 2 THEN 'b.c.' WHEN 3 THEN 'www.' ELSE '' END)
           |  || 'd' || substr(hex, 1, 2)
           |  || (CASE id % 5 WHEN 0 THEN '.com' WHEN 1 THEN '.org' WHEN 2 THEN '.net'
           |      WHEN 3 THEN '.co.uk' ELSE '.ac.uk' END)
           |  || (CASE WHEN id % 11 = 0 THEN ':443' WHEN id % 13 = 0 THEN ':8080' ELSE '' END)
           |  || '/P/' || substr(hex, 3, 3)
           |  || (CASE WHEN id % 6 = 0 THEN '/' ELSE '' END)
           |  || (CASE id % 7 WHEN 0 THEN '?utm_source=feed&x=' || substr(hex, 6, 2)
           |      WHEN 1 THEN '?x=' || substr(hex, 6, 2) || '&utm_campaign=z'
           |      WHEN 2 THEN '?utm_only=1' ELSE '' END)
           |  || (CASE WHEN id % 2 = 0 THEN '#s' || substr(hex, 8, 1) ELSE '' END) AS url
           | FROM d),
           |n1 AS (SELECT id, regexp_replace(url, '#.*$', '', 'g') AS v FROM u),
           |n2 AS (SELECT id, lower(regexp_extract(v, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*'))
           |  || substr(v, length(regexp_extract(v, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*')) + 1)
           |  AS v FROM n1),
           |n3 AS (SELECT id, regexp_replace(v, '^([a-z][a-z0-9+.-]*://)www\.', '\1') AS v FROM n2),
           |n4 AS (SELECT id, regexp_replace(v, '^([a-z]+://[^/:?#]+):(?:80|443)([/?#]|$)', '\1\2') AS v FROM n3),
           |n5 AS (SELECT id, regexp_replace(v, '&utm_[^&#]*', '', 'g') AS v FROM n4),
           |n6 AS (SELECT id, regexp_replace(regexp_replace(v, '\?utm_[^&#]*&', '?'),
           |  '\?utm_[^&#]*$', '') AS v FROM n5),
           |nf AS (SELECT id, regexp_replace(v, '/$', '') AS norm FROM n6),
           |hd AS (SELECT id, norm, regexp_extract(norm, '^[a-z]+://([^/:?#]+)', 1) AS host FROM nf),
           |dom AS (SELECT id, norm,
           |  CASE WHEN host LIKE '%.co.uk' OR host LIKE '%.ac.uk'
           |       THEN regexp_extract(host, '([^.]+\.[^.]+\.[^.]+)$', 1)
           |       ELSE regexp_extract(host, '([^.]+\.[^.]+)$', 1) END AS domain FROM hd)
           |SELECT domain, COUNT(*) AS n, COUNT(DISTINCT norm) AS n_unique, MIN(norm) AS min_url
           |FROM dom
           |WHERE domain NOT IN ('d0a.com','d1b.org','d2c.net','d3d.co.uk','d4e.ac.uk','dff.com')
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  // HTML → text extraction (ext/HtmlText — VERDICT r7 item 5): one
  // deterministic synthetic page per doc (head+style+title, a nav bar
  // of links, an h1, the doc text as the article body, a script block
  // on every 3rd doc whose body contains a BARE `<`, an HTML comment,
  // an entity-laden appendix paragraph, a footer) — regenerable from
  // the same md5 twin in DuckDB. Extraction: drop script/style/title/
  // comment subtrees, split at block tags, strip inline tags, decode
  // entities, collapse whitespace, and gate boilerplate by the integer
  // text-to-markup density rule (nav/footer/h1 die, article+appendix
  // survive). fp = md5 of the full extracted text, so a hash match
  // proves the two engines agree on every BYTE of the extraction, not
  // just on counts.
  private val htmlExtract = Q(
    "q_html_extract",
    (s, dir) => {
      val id = col("doc_id")
      val hex = md5(id.cast("string"))
      val title = concat(lit("Doc "), id.cast("string"))
      val html = concat(
        lit("<html><head><title>"), title,
        lit("</title><style>p{margin:0} .x{color:red}</style></head><body>"),
        lit("<div class=\"nav\"><a href=\"/\">Home</a> | " +
          "<a href=\"/about\">About</a> | <a href=\"/login\">Login</a></div>"),
        lit("<h1>"), title, lit("</h1>"),
        lit("<p>"), col("text"), lit("</p>"),
        when(id % 3 === 0, lit("<script type=\"text/javascript\">var x=1; " +
          "if (x<2) { x = x+1; } track(\"page\");</script>")).otherwise(lit("")),
        lit("<!-- render "), substring(hex, 1, 4), lit(" -->"),
        lit("<p>Appendix "), substring(hex, 1, 16),
        lit(" &amp; checksum "), substring(hex, 17, 8),
        lit(" &lt;verified&gt; &#39;ok&#39; &quot;final&quot;</p>"),
        lit("<div class=\"footer\">&copy; 2020 corp &middot; terms</div>"),
        lit("</body></html>"))
      t(s, dir, "documents").select(id.as("doc_id"), html.as("html"))
        .select(col("doc_id"),
          size(graft.ext.HtmlText.nonEmptyBlocks(col("html")))
            .cast("long").as("n_blocks"),
          size(graft.ext.HtmlText.keptBlocks(col("html")))
            .cast("long").as("n_kept"),
          graft.ext.HtmlText.extract(col("html")).as("extracted"))
        .select(col("doc_id"), col("n_blocks"), col("n_kept"),
          length(col("extracted")).cast("long").as("n_chars"),
          md5(col("extracted")).as("fp"))
        .orderBy("doc_id")
    },
    Some("""WITH h AS (SELECT doc_id, '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR)
           |  || '</title><style>p{margin:0} .x{color:red}</style></head><body>'
           |  || '<div class="nav"><a href="/">Home</a> | <a href="/about">About</a> | <a href="/login">Login</a></div>'
           |  || '<h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1>'
           |  || '<p>' || text || '</p>'
           |  || (CASE WHEN doc_id % 3 = 0 THEN '<script type="text/javascript">var x=1; if (x<2) { x = x+1; } track("page");</script>' ELSE '' END)
           |  || '<!-- render ' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) || ' -->'
           |  || '<p>Appendix ' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16)
           |  || ' &amp; checksum ' || substr(md5(CAST(doc_id AS VARCHAR)), 17, 8)
           |  || ' &lt;verified&gt; &#39;ok&#39; &quot;final&quot;</p>'
           |  || '<div class="footer">&copy; 2020 corp &middot; terms</div></body></html>' AS html
           |  FROM documents),
           |c AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
           |    '(?is)<script\b[^>]*>.*?</script>', ' ', 'g'),
           |    '(?is)<style\b[^>]*>.*?</style>', ' ', 'g'),
           |    '(?is)<title\b[^>]*>.*?</title>', ' ', 'g'),
           |    '(?s)<!--.*?-->', ' ', 'g') AS s FROM h),
           |b AS (SELECT doc_id, list_transform(
           |    string_split_regex(s, '(?i)</?(?:p|div|h[1-6]|li|ul|ol|br|table|tr|td|th|article|section|header|footer|html|head|body|blockquote|pre|nav|aside|figure)\b[^>]*>'),
           |    x -> struct_pack(raw := length(x), t := trim(regexp_replace(
           |      replace(replace(replace(replace(replace(replace(
           |        regexp_replace(x, '<[^>]+>', ' ', 'g'),
           |        '&lt;','<'),'&gt;','>'),'&quot;','"'),'&#39;',chr(39)),'&nbsp;',' '),'&amp;','&'),
           |      '\s+', ' ', 'g')))) AS sc FROM c),
           |k AS (SELECT doc_id,
           |    len(list_filter(sc, s -> s.t <> '')) AS n_blocks,
           |    list_filter(sc, s -> length(s.t) >= 30 AND length(s.t)*100 >= s.raw*60) AS kept
           |  FROM b),
           |e AS (SELECT doc_id, n_blocks, len(kept) AS n_kept,
           |    array_to_string(list_transform(kept, s -> s.t), chr(10)) AS extracted FROM k)
           |SELECT doc_id, CAST(n_blocks AS BIGINT) AS n_blocks,
           |  CAST(n_kept AS BIGINT) AS n_kept,
           |  CAST(length(extracted) AS BIGINT) AS n_chars, md5(extracted) AS fp
           |FROM e ORDER BY doc_id""".stripMargin))

  val all: Seq[Q] = Seq(gopherRepetition, boilerplateNgrams, boilerplateScrub,
    semDedup, dsirWeights, hardNegatives, kAnon, docRepScrub, urlCurate,
    htmlExtract)
}
