package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/**
 * Retrieval-corpus assembly — the RAG indexing pipeline as ONE lazy plan:
 * context-length chunking (`ops/Packing.chunkByBudget` supplies the
 * window arithmetic) → vocabulary-free hash-feature vectorization (the
 * `TextStats.hashFeatures` bucket scheme) → sparse cosine scoring of
 * every chunk against a query vector → top-k. The composite exists for
 * the same reason as `q_corpus_clean`: proving the operators COMPOSE
 * without materialization barriers is what makes them a pipeline rather
 * than a toolbox.
 *
 * Scale shape: chunking is a shuffle-free explode; featurization is one
 * (chunk, bucket) partial-aggregated count; the query side is a
 * handful of rows (the query's own tokens) and BROADCASTS onto the
 * sparse chunk features keyed by bucket — the corpus is never shuffled
 * for scoring, and the final top-k is TakeOrderedAndProject
 * (per-partition heads, merge on the driver: k rows cross the wire, not
 * the corpus). Determinism: dots and squared norms are exact integer
 * sums; the only IEEE steps are two correctly-rounded sqrts and one
 * division, in a pinned order the DuckDB oracle replays.
 */
object Retrieval {

  /** Slice documents into ≤`budget`-token training/retrieval windows with
    * their text: (idCol, chunk_id, chunk_tokens, chunk_text). The window
    * bookkeeping (how many chunks, each chunk's token count) is
    * [[graft.ops.Packing.chunkByBudget]]; this adds the text slice. */
  def chunkTexts(docs: DataFrame, idCol: String, textCol: String,
      budget: Int): DataFrame = {
    val toks = TextStats.tokens(col(textCol))
    val base = docs.select(col(idCol), toks.as("__toks"),
      size(toks).cast("long").as("__n"))
    graft.ops.Packing.chunkByBudget(base, "__n", budget.toLong)
      .withColumn("chunk_text",
        concat_ws(" ", slice(col("__toks"),
          (col("chunk_id") * budget + 1).cast("int"), lit(budget))))
      .select(col(idCol), col("chunk_id"), col("chunk_tokens"), col("chunk_text"))
  }

  /**
   * Retrieve the `k` chunks most cosine-similar (in `dim`-bucket hash
   * feature space) to the corpus-derived query = the corpus's `qTokens`
   * most frequent tokens (ties lexicographic) — the same data-derived
   * query convention as `q_text_bm25`, so the operator needs no external
   * fixture. Output: (idCol, chunk_id, chunk_tokens, cos), top-k by
   * (cos desc, id, chunk_id).
   */
  def retrieveTopK(docs: DataFrame, idCol: String, textCol: String,
      budget: Int = 32, dim: Int = 1024, qTokens: Int = 3, k: Int = 5): DataFrame = {
    val chunks = chunkTexts(docs, idCol, textCol, budget)
    val bucket = pmod(graft.ops.ApproxDistinct.kmvHash(col("token")), lit(dim.toLong))
      .as("bucket")
    val feats = chunks
      .select(col(idCol), col("chunk_id"), col("chunk_tokens"),
        explode(TextStats.tokens(col("chunk_text"))).as("token"))
      .select(col(idCol), col("chunk_id"), col("chunk_tokens"), bucket)
      .groupBy(idCol, "chunk_id", "chunk_tokens", "bucket")
      .agg(count(lit(1)).as("cnt"))
    val norms = feats.groupBy(idCol, "chunk_id", "chunk_tokens")
      .agg(sum(col("cnt") * col("cnt")).as("nc"))

    val query = docs
      .select(explode(TextStats.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(qTokens)
      .select(bucket).groupBy("bucket").agg(count(lit(1)).as("qcnt"))
    val qNorm = query.agg(sum(col("qcnt") * col("qcnt")).as("nq"))

    val dots = feats.join(broadcast(query), "bucket")
      .groupBy(idCol, "chunk_id")
      .agg(sum(col("cnt") * col("qcnt")).as("dot"))

    dots
      .join(norms, Seq(idCol, "chunk_id"))
      .crossJoin(broadcast(qNorm))
      .withColumn("cos",
        col("dot").cast(DoubleType) /
          (sqrt(col("nc").cast(DoubleType)) * sqrt(col("nq").cast(DoubleType))))
      .select(col(idCol), col("chunk_id"), col("chunk_tokens"), col("cos"))
      .orderBy(col("cos").desc, col(idCol), col("chunk_id"))
      .limit(k)
  }
}
