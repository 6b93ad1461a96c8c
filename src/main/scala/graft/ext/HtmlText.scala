package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * HTML → text extraction for web-corpus curation — the stage every
 * published crawl pipeline (CCNet, RefinedWeb, trafilatura's
 * extraction core) runs between the fetched page and the text-quality
 * gates ([[TextStats]]'s filter chain), and the one conspicuous hop
 * between [[UrlOps]]'s URL-side curation and `q_text_filter`'s
 * text-side gates (VERDICT r7 item 5).
 *
 * Everything is a pure `Column` expression chain — regexes, `split`,
 * and higher-order array functions over codegen'd string ops, zero
 * UDFs — so extraction stays inside WholeStageCodegen and scales as a
 * per-row map with no shuffle; at 100 TB of crawl HTML this is the
 * shape that keeps the stage I/O-bound instead of serialization-bound.
 *
 * The pipeline is a fixed, documented rule set (each rule replayable
 * in any regex engine — the DuckDB oracle replays all of it):
 *
 *  1. drop non-content SUBTREES whole: `<script>…</script>`,
 *     `<style>…</style>`, `<title>…</title>`, `<!-- comments -->`
 *     (their inner text is code/UI, never corpus text — and script
 *     bodies legally contain bare `<`, so they must go BEFORE any
 *     tag-level parsing);
 *  2. split what remains into BLOCKS at block-level tag boundaries
 *     (`p`, `div`, headings, list/table elements, `br`, sectioning
 *     tags) — the unit boilerplate detection needs;
 *  3. per block: strip remaining (inline) tags, decode the five
 *     standard character entities + `&nbsp;`, collapse whitespace;
 *  4. BOILERPLATE GATE by text-to-markup density: a block survives iff
 *     its clean text is at least `minTextLen` chars AND makes up at
 *     least `densityPct`% of the block's raw length — nav bars,
 *     footers, and link lists are short and markup-heavy, article
 *     text is long and markup-light (the same signal trafilatura /
 *     jusText threshold on);
 *  5. join surviving blocks with newlines.
 *
 * Tag soup is handled by construction: unclosed tags just end a block
 * at the next boundary, unknown tags strip as inline markup. The
 * integer density compare (`100·text ≥ pct·raw`) keeps the gate
 * float-free, so engines cannot disagree on a rounding ulp.
 */
object HtmlText {

  /** Block-level boundary tags (opening or closing, any attributes). */
  val BlockTagRe: String =
    "(?i)</?(?:p|div|h[1-6]|li|ul|ol|br|table|tr|td|th|article|section|" +
      "header|footer|html|head|body|blockquote|pre|nav|aside|figure)\\b[^>]*>"

  /** Rule 1: remove non-content subtrees whole. */
  def dropNonContent(html: Column): Column = {
    val noScript =
      regexp_replace(html, "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noStyle =
      regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style>", " ")
    val noTitle =
      regexp_replace(noStyle, "(?is)<title\\b[^>]*>.*?</title>", " ")
    regexp_replace(noTitle, "(?s)<!--.*?-->", " ")
  }

  /** Rule 2: raw blocks between block-level boundaries. */
  def blocksOf(html: Column): Column =
    split(dropNonContent(html), BlockTagRe)

  /** Rule 3 for one block: inline-tag strip → entity decode →
    * whitespace collapse → trim. `&amp;` decodes LAST so a literal
    * `&amp;lt;` round-trips to `&lt;`, not `<`. */
  def blockText(b: Column): Column = {
    val noTags = regexp_replace(b, "<[^>]+>", " ")
    val decoded = regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(regexp_replace(
        noTags,
        "&lt;", "<"), "&gt;", ">"), "&quot;", "\""),
      "&#39;", "'"), "&nbsp;", " "), "&amp;", "&")
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Rules 2–5: the extracted text of a page, newline-joined surviving
    * blocks. */
  def extract(html: Column, minTextLen: Int = 30,
      densityPct: Int = 60): Column =
    array_join(transform(keptBlocks(html, minTextLen, densityPct),
      s => s.getField("t")), "\n")

  /** Surviving blocks as `struct(t, raw)` (clean text, raw block
    * length) — the scored form callers aggregate over. */
  def keptBlocks(html: Column, minTextLen: Int = 30,
      densityPct: Int = 60): Column = {
    val scored = transform(blocksOf(html),
      b => struct(blockText(b).as("t"), length(b).as("raw")))
    // the density product runs in 64-bit: a >21M-char block would
    // overflow a 32-bit `length*100` silently (non-ANSI Spark) and flip
    // the verdict away from the oracle's 64-bit arithmetic
    filter(scored, s =>
      length(s.getField("t")) >= minTextLen &&
        length(s.getField("t")).cast("long") * 100 >=
          s.getField("raw").cast("long") * densityPct)
  }

  /** Blocks with any (non-whitespace) text at all — the denominator a
    * boilerplate ratio reports against. Counted from the CLEAN text so
    * the figure cannot depend on how a regex engine treats empty split
    * tokens. */
  def nonEmptyBlocks(html: Column): Column =
    filter(transform(blocksOf(html), blockText(_)), t => t =!= "")
}
