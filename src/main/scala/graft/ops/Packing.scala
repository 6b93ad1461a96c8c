package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sequence packing for LLM training-data assembly: assign every document a
 * (sequence id, offset) such that concatenating the documents of a stratum
 * in a deterministic order fills fixed-token-budget training sequences
 * back-to-back. The contiguous-fill formulation — exclusive running sum of
 * token counts, binned by integer division — is a parallel prefix sum, so
 * one running-total window (state per partition: a single counter) computes
 * it distributed, and the result is identical to a single-threaded packer
 * walking the same order.
 *
 * Scale: the window shuffles once on the strata columns; any
 * bounded-cardinality mixture key (language, source bucket) keeps
 * partitions executor-sized at corpus scale. A single GLOBAL pack order
 * (no strata) is the one shape a plain window cannot distribute — that
 * variant needs range partitioning by the order column plus a two-pass
 * per-range offset fix-up, which this math supports unchanged because the
 * bin of a document depends only on its exclusive prefix sum.
 */
object Packing {

  /**
   * Greedy contiguous packing: documents ordered by `orderCol` within each
   * stratum fill sequences of `budget` weight units. Emits `seq_id` (the
   * sequence the document STARTS in) and `seq_offset` (its start offset
   * within that sequence); a document whose weight crosses the boundary
   * spills into the next sequence, exactly how block-packed training
   * corpora treat document boundaries. Pure integer arithmetic — portable
   * to any engine for oracle checks.
   */
  def packGreedy(df: DataFrame, strataCols: Seq[String], orderCol: String,
      weightCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val start = (sum(col(weightCol)).over(w) - col(weightCol)).cast("long")
    df.withColumn("seq_id", floor(start / lit(budget)).cast("long"))
      .withColumn("seq_offset", (start % lit(budget)).cast("long"))
  }

  /**
   * Global (no-strata) greedy packing — the shape a plain window cannot
   * distribute, done as the textbook parallel prefix sum:
   *
   *   0. compute `numRanges−1` quantile boundaries of `orderCol` ONCE and
   *      bake them into the plan as literals, so a row's range id is a
   *      pure function of its value — both later passes derive identical
   *      partitioning by construction (deriving the id from the physical
   *      partitioning instead, e.g. `spark_partition_id` after
   *      `repartitionByRange`, is wrong: the range sampler's seed differs
   *      per query execution, and the two passes can disagree);
   *   1. aggregate one total weight per range — |ranges| rows to the
   *      driver, an exclusive scan gives each range its base offset;
   *   2. broadcast the bases back and add each row's LOCAL exclusive
   *      prefix (a per-range window — never a single-partition sort).
   *
   * Cost: two column-pruned scans (quantile sketch, per-range totals) plus
   * the one data-sized shuffle of the per-range window. Driver state is
   * one long per range — bounded by cluster size, not data. Quantile
   * boundaries keep ranges balanced under arbitrary key skew (relative
   * error 1e-3).
   *
   * `orderCol` must be numeric and non-null, and (`orderCol`,
   * `tieCols`) must be unique. Ties on `orderCol` CANNOT straddle a
   * range boundary — the range id is a pure function of the value, so
   * equal values always share a range — and within the range `tieCols`
   * complete the sort. (Round 7: the tie columns replaced the packed
   * single-long order key `doc_id − n_chars·10⁶`, whose encoding
   * silently collapsed once doc_id reached 10⁶ — found by the sf1
   * certification probe, where shifted replica ids crossed exactly that
   * cliff; a real 100 TB corpus crosses it in the first billion docs.)
   */
  def packGreedyGlobal(df: DataFrame, orderCol: String, weightCol: String,
      budget: Long, numRanges: Int = 0, tieCols: Seq[String] = Nil): DataFrame = {
    val spark = df.sparkSession
    val n = if (numRanges > 0) numRanges
      else spark.sessionState.conf.numShufflePartitions
    val bounds = df.stat.approxQuantile(
      orderCol, (1 until n).map(_.toDouble / n).toArray, 0.001).distinct
    val v = col(orderCol).cast("double")
    val pid = bounds.map(b => when(v > lit(b), 1).otherwise(0))
      .foldLeft(lit(0))(_ + _)
    val pidded = df.withColumn("__pid", pid)
    val totals = pidded.groupBy("__pid")
      .agg(sum(col(weightCol).cast("long")).as("__w"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val bases = totals.map { case (rangeId, w) =>
      val row = (rangeId, acc); acc += w; row
    }.toSeq
    import spark.implicits._
    val baseDf = bases.toDF("__pid", "__base")
    val w = Window.partitionBy(col("__pid"))
      .orderBy((col(orderCol) +: tieCols.map(col)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val start = col("__base") +
      sum(col(weightCol).cast("long")).over(w) - col(weightCol)
    pidded.join(broadcast(baseDf), "__pid")
      .withColumn("seq_id", floor(start / lit(budget)).cast("long"))
      .withColumn("seq_offset", (start % lit(budget)).cast("long"))
      .drop("__pid", "__base")
  }

  /**
   * Context-length chunking: split every document into `ceil(w / budget)`
   * chunks of at most `budget` weight units — the "long document → many
   * training windows" op. Shuffle-free (explode over a generated index
   * array is a per-row projection); zero-weight rows are dropped, they
   * have no chunk to land in. Pure integer arithmetic end to end.
   */
  def chunkByBudget(df: DataFrame, weightCol: String, budget: Long): DataFrame = {
    val wgt = col(weightCol).cast("long")
    val nChunks = floor((wgt + lit(budget - 1)) / lit(budget)).cast("long")
    df.filter(wgt > 0)
      .withColumn("chunk_id", explode(sequence(lit(0L), nChunks - 1)))
      .withColumn("chunk_tokens",
        least(lit(budget), wgt - col("chunk_id") * lit(budget)))
  }
}
