package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed global running aggregates — the scale-safe replacement for
 * `Window.orderBy(...)` with no partition spec (which Spark executes as a
 * SINGLE-partition sort: the whole frame through one task, the classic
 * 100 TB serialization point). Same two-pass parallel-prefix shape as
 * [[Packing.packGreedyGlobal]]:
 *
 *   0. `numRanges−1` approx-quantile boundaries of `orderCol`, baked into
 *      the plan as literals so a row's range id is a pure function of its
 *      value (both passes derive identical partitioning by construction);
 *   1. ONE aggregate row per range to the driver (|ranges| values,
 *      bounded by cluster size, not data) — an exclusive scan over those
 *      gives each range its carry-in base;
 *   2. broadcast the bases back; each row combines its range's base with
 *      a LOCAL running aggregate (a per-range window — parallel).
 *
 * Contract shared with `packGreedyGlobal`: `orderCol` numeric and
 * non-null; for uniquely-defined per-row output it must also be unique
 * (the intended caller passes DISTINCT values, e.g. a groupBy key).
 */
object PrefixSum {

  /** Range id as a literal fold over the quantile bounds — `#bounds < v`. */
  private def rangeId(df: DataFrame, orderCol: String, numRanges: Int): (DataFrame, Column) = {
    val n = if (numRanges > 0) numRanges
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // n == 1 → a single range, no interior bounds (approxQuantile on an
    // empty probability array NPEs — caught by PrefixSumSpec)
    val bounds = if (n <= 1) Array.empty[Double]
      else df.stat.approxQuantile(
        orderCol, (1 until n).map(_.toDouble / n).toArray, 0.001).distinct
    val v = col(orderCol).cast("double")
    val pid = bounds.map(b => when(v > lit(b), 1).otherwise(0))
      .foldLeft(lit(0))(_ + _)
    (df.withColumn("__pid", pid), col("__pid"))
  }

  /** Inclusive global running SUM of `weightCol` in `orderCol` order,
    * emitted as LONG column `outCol`. Bit-identical to
    * `sum(w).over(Window.orderBy(orderCol).rowsBetween(unboundedPreceding,
    * currentRow))` — without the single-partition sort. */
  def runningSum(df: DataFrame, orderCol: String, weightCol: String,
      outCol: String, numRanges: Int = 0): DataFrame =
    runningSums(df, orderCol, Seq(weightCol), Seq(outCol), numRanges)

  /** Several inclusive running sums in ONE two-pass scan: same range ids,
    * one per-range totals collect carrying all weight columns, one
    * partitioned window per output. Chaining single-column calls instead
    * would re-execute every earlier call's join+window inside each later
    * call's quantile/totals jobs — measured 2× on q_ks_drift's CDF pair. */
  def runningSums(df: DataFrame, orderCol: String, weightCols: Seq[String],
      outCols: Seq[String], numRanges: Int = 0): DataFrame = {
    require(weightCols.nonEmpty && weightCols.length == outCols.length)
    val spark = df.sparkSession
    import spark.implicits._
    val (pidded, pid) = rangeId(df, orderCol, numRanges)
    // coalesce: an all-NULL weight column within one range yields sum()=NULL
    // and would NPE the getLong below — an empty contribution is 0, not null
    val aggs = weightCols.map(wc =>
      coalesce(sum(col(wc).cast("long")), lit(0L)).as(s"__w_$wc"))
    val totals = pidded.groupBy(pid)
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .map(r => (r.getInt(0), weightCols.indices.map(i => r.getLong(i + 1))))
      .sortBy(_._1)
    val acc = Array.fill(weightCols.length)(0L)
    val bases = totals.map { case (p, ws) =>
      val row = (p, acc.toSeq)
      ws.zipWithIndex.foreach { case (w, i) => acc(i) += w }
      row
    }.toSeq
    val baseDf = broadcast(bases.map { case (p, bs) => (p, bs) }
      .toDF("__pid", "__bases"))
    val w = Window.partitionBy(pid).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = pidded.join(baseDf, "__pid")
    val withOuts = weightCols.zip(outCols).zipWithIndex
      .foldLeft(joined) { case (acc0, ((wc, oc), i)) =>
        acc0.withColumn(oc,
          (element_at(col("__bases"), i + 1)
            + sum(col(wc).cast("long")).over(w)).cast("long"))
      }
    withOuts.drop("__pid", "__bases")
  }

  /** Per-group inclusive running sums — the grouped form of
    * [[runningSums]], for "cumulative sum within each domain" shapes
    * where `Window.partitionBy(group)` alone would serialize an entire
    * domain through one task (at 100 TB with ~5 language domains that is
    * ~20 TB per task). Parallelism here is |groups| × |ranges|:
    *
    *   - quantile bounds are computed ONCE on the global `orderCol`
    *     distribution (the intended orderCol is a uniform content hash,
    *     so every group's rows spread evenly over the ranges);
    *   - pass 1 collects ONE totals row per (group, range) — bounded by
    *     |groups|·|ranges|, never data — and the exclusive carry-in scan
    *     runs per group on the driver;
    *   - pass 2 windows over (group, range) partitions, each a bounded
    *     slice of one domain.
    *
    * `tieCols` complete the in-range sort when `orderCol` is not unique
    * within a group (e.g. a truncated 60-bit hash). Bit-identical to
    * `sum(w).over(Window.partitionBy(group).orderBy(orderCol, ties...))`.
    */
  def runningSumsBy(df: DataFrame, groupCol: String, orderCol: String,
      tieCols: Seq[String], weightCols: Seq[String], outCols: Seq[String],
      numRanges: Int = 0): DataFrame = {
    require(weightCols.nonEmpty && weightCols.length == outCols.length)
    val spark = df.sparkSession
    import spark.implicits._
    val (pidded, pid) = rangeId(df, orderCol, numRanges)
    val aggs = weightCols.map(wc =>
      coalesce(sum(col(wc).cast("long")), lit(0L)).as(s"__w_$wc"))
    val totals = pidded.groupBy(col(groupCol).cast("string").as("__g"), pid)
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .map(r => (r.getString(0), r.getInt(1),
        weightCols.indices.map(i => r.getLong(i + 2))))
    val bases = totals.groupBy(_._1).toSeq.flatMap { case (g, rows) =>
      val acc = Array.fill(weightCols.length)(0L)
      rows.sortBy(_._2).map { case (_, p, ws) =>
        val row = (g, p, acc.toSeq)
        ws.zipWithIndex.foreach { case (w, i) => acc(i) += w }
        row
      }
    }
    val baseDf = broadcast(bases.toDF("__g", "__pid", "__bases"))
    val joined = pidded.withColumn("__g", col(groupCol).cast("string"))
      .join(baseDf, Seq("__g", "__pid"))
    val w = Window.partitionBy(col(groupCol), pid)
      .orderBy((col(orderCol) +: tieCols.map(col)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withOuts = weightCols.zip(outCols).zipWithIndex
      .foldLeft(joined) { case (acc0, ((wc, oc), i)) =>
        acc0.withColumn(oc,
          (element_at(col("__bases"), i + 1)
            + sum(col(wc).cast("long")).over(w)).cast("long"))
      }
    withOuts.drop("__g", "__pid", "__bases")
  }

  /** Global `row_number()` in (`orderCol` DESC, `tieCols` ASC) order
    * WITHOUT an unpartitioned window — the ranking face of the same
    * two-pass idiom: range-bucket on `orderCol` (equal values always
    * share a bucket — the id is a pure function of the value — so a
    * string tiebreak never crosses buckets), rank locally per bucket,
    * add per-bucket base offsets (an exclusive scan over |ranges|
    * driver values, bounded by cluster width, never data). Bit-identical
    * to `row_number().over(Window.orderBy(desc(orderCol), ties…))`. */
  def rankDesc(df: DataFrame, orderCol: String, tieCols: Seq[String],
      outCol: String, numRanges: Int = 0): DataFrame = {
    val (pidded, pid) = rangeId(df, orderCol, numRanges)
    val cnts = pidded.groupBy(pid).agg(count(lit(1)).as("__c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val pids = cnts.keys.toSeq.sorted
    // descending rank: a bucket's base = total rows in HIGHER buckets
    val baseMap = pids.map(p => p -> pids.filter(_ > p).map(cnts).sum).toMap
    val baseCol = baseMap.foldLeft(lit(0L)) { case (acc, (p, b)) =>
      when(pid === lit(p), lit(b)).otherwise(acc)
    }
    val w = Window.partitionBy(pid)
      .orderBy(col(orderCol).desc +: tieCols.map(col): _*)
    pidded.withColumn(outCol,
      (baseCol + row_number().over(w)).cast("long")).drop("__pid")
  }

  /** The 2-D skyline staircase, distributed: running MAX of `valueCol`
    * over rows with a strictly-smaller (`ltCol`) and smaller-or-equal
    * (`leCol`) `orderCol`. `ltCol` is null on the global minimum (no
    * strictly-cheaper row exists) — same contract as
    * `lag(max.over(orderBy))`. The carry-in base for a range is the max
    * of all earlier ranges, an exclusive max-scan of |ranges| values. */
  def staircaseMax(df: DataFrame, orderCol: String, valueCol: String,
      leCol: String, ltCol: String, numRanges: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (pidded, pid) = rangeId(df, orderCol, numRanges)
    val maxes = pidded.groupBy(pid)
      .agg(max(col(valueCol).cast("double")).as("__m"))
      .collect().map(r => (r.getInt(0), r.getDouble(1))).sortBy(_._1)
    var acc = Option.empty[Double]
    val bases = maxes.map { case (p, m) =>
      val row = (p, acc); acc = Some(acc.fold(m)(math.max(_, m))); row
    }.toSeq
    val ord = Window.partitionBy(pid).orderBy(col(orderCol))
    val localLe = max(col(valueCol).cast("double"))
      .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val baseDf = bases.map { case (p, b) => (p, b.getOrElse(Double.NaN), b.isDefined) }
      .toDF("__pid", "__base", "__has_base")
    val base = when(col("__has_base"), col("__base"))
    pidded.join(broadcast(baseDf), "__pid")
      .withColumn(leCol, greatest(localLe, coalesce(base, localLe)))
      .withColumn(ltCol, {
        val lagLe = lag(col(leCol), 1).over(ord)
        coalesce(lagLe, base)
      })
      .drop("__pid", "__base", "__has_base")
  }
}
