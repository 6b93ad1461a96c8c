package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Exact substring (repeated n-gram SPAN) deduplication — the token-window
 * approximation of suffix-array substring dedup ("Deduplicating Training
 * Data Makes Language Models Better", Lee et al. 2022): any W-token
 * window that occurs more than once in the corpus is duplicated text;
 * every occurrence EXCEPT the canonical first one (min doc_id, then min
 * position) is removable, and overlapping/adjacent removable windows
 * merge into maximal spans. Unlike document-level dedup (ext/Dedup) this
 * catches boilerplate repeated INSIDE otherwise-distinct documents —
 * headers, license blocks, templated paragraphs — which document-level
 * Jaccard can never flag.
 *
 * Scale shape: window extraction is a pure projection (Σ tokens rows, no
 * shuffle); duplicate detection is ONE shuffle keyed by window content
 * (at 100 TB you'd key the exchange by xxhash64(window) and keep the
 * string only for verification — same plan, smaller shuffle); span
 * merging is a per-document window (partitioned by doc, never global).
 * Nothing is ever pairwise in documents.
 */
object SpanDedup {

  /** Every W-token window occurrence: (doc_id, pos, win). */
  private def windowOccurrences(df: DataFrame, idCol: String, textCol: String,
      w: Int): DataFrame =
    df.select(col(idCol).as("doc_id"), TextStats.tokens(col(textCol)).as("a"))
      .filter(size(col("a")) >= w)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), size(col("a")) - w),
          i => concat_ws(" ", slice(col("a"), i + 1, lit(w))))).as(Seq("pos", "win")))
      .withColumn("pos", col("pos").cast("long"))

  /** Occurrences of duplicated windows MINUS the canonical first
    * occurrence (min doc_id, min pos within it) of each window. */
  private def removable(df: DataFrame, idCol: String, textCol: String,
      w: Int): DataFrame = {
    val occ = graft.ops.BoundedCache.cached(
      windowOccurrences(df, idCol, textCol, w))
    // fresh-aliased derived frames so the occ self-joins stay unambiguous
    val dups = occ.groupBy("win")
      .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("fdoc"))
      .filter(col("cnt") > 1)
      .select(col("win").as("dwin"), col("fdoc"))
    val firsts = occ.join(dups,
        occ("win") === col("dwin") && occ("doc_id") === col("fdoc"))
      .groupBy(col("dwin").as("fwin"), col("fdoc"))
      .agg(min(col("pos")).as("fpos"))
    occ.join(firsts, occ("win") === col("fwin"))
      .filter(!(col("doc_id") === col("fdoc") && col("pos") === col("fpos")))
      .select(occ("doc_id"), occ("pos"))
  }

  /**
   * Maximal duplicated spans per document: removable window starts merged
   * wherever their [pos, pos+W-1] token ranges overlap or touch. Output:
   * (doc_id, span_start, span_end, n_windows), token positions inclusive.
   */
  def repeatedSpans(df: DataFrame, idCol: String, textCol: String,
      w: Int): DataFrame = {
    val rem = removable(df, idCol, textCol, w)
    val ord = Window.partitionBy("doc_id").orderBy("pos")
    val prevMax = max(col("pos") + (w - 1))
      .over(ord.rowsBetween(Window.unboundedPreceding, -1))
    rem
      .withColumn("new_span",
        when(prevMax.isNull || col("pos") > prevMax + 1, 1L).otherwise(0L))
      .withColumn("span_id", sum(col("new_span"))
        .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "span_id")
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + (w - 1)).as("span_end"),
        count(lit(1)).as("n_windows"))
      .drop("span_id")
  }

  /**
   * The APPLY step: rebuild every document without its duplicated spans
   * (the canonical first occurrence elsewhere survives, so the corpus
   * keeps exactly one copy of each repeated passage). Documents whose
   * tokens are all removed drop out. Output: (doc_id, n_tokens_kept,
   * clean_text).
   */
  def removeSpans(df: DataFrame, idCol: String, textCol: String,
      w: Int): DataFrame = {
    val spans = repeatedSpans(df, idCol, textCol, w)
      .select(col("doc_id").as("s_doc"), col("span_start"), col("span_end"))
    val toks = df
      .select(col(idCol).as("doc_id"),
        posexplode(TextStats.tokens(col(textCol))).as(Seq("pos", "tok")))
      .withColumn("pos", col("pos").cast("long"))
    toks
      .join(spans, col("doc_id") === col("s_doc")
        && col("pos").between(col("span_start"), col("span_end")), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens_kept"),
        concat_ws(" ",
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            s => s.getField("tok"))).as("clean_text"))
  }
}
