package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/**
 * Heavy hitters (frequent items) via a mergeable Misra-Gries summary plus
 * an exact re-count verify — the sketch-then-verify pattern the engine
 * also uses for MinHash/LSH dedup (cf. reference validation-gate style
 * checks, /root/reference/python_scripts/test_data.py:33-54: cheap scan
 * first, exact confirmation second).
 *
 * Scale design: the Misra-Gries buffer is a bounded map of `capacity`
 * entries, so the aggregation shuffles ≤capacity (token, count) pairs per
 * partition instead of one row per distinct token — at 100 TB the
 * candidate pass is map-side-bounded the way a partial `groupBy` count is
 * not (its shuffle grows with the vocabulary). The classic MG guarantee:
 * after summarizing n items with capacity k, every item with true
 * frequency > n/(k+1) is present in the summary, and each retained count
 * under-estimates by at most n/(k+1). Merging two summaries and trimming
 * back to k keeps the combined guarantee (Agarwal et al., "Mergeable
 * Summaries", PODS 2012). The verify stage semi-joins the corpus against
 * the (tiny, broadcast) candidate set and re-counts exactly, so the final
 * output is EXACTLY the items with count ≥ support·n — which is why a
 * plain SQL oracle can hash-match an approximate-sketch operator.
 */
object FreqItems {

  /** Product wrapper so the aggregator output rides a struct encoder. */
  final case class MGSummary(items: Map[String, Long])

  /** Mergeable Misra-Gries summary of a string column. */
  final class MisraGries(capacity: Int)
      extends Aggregator[String, mutable.Map[String, Long], MGSummary] {
    require(capacity > 0, "capacity must be positive")

    override def zero: mutable.Map[String, Long] = mutable.Map.empty

    override def reduce(b: mutable.Map[String, Long], tok: String): mutable.Map[String, Long] = {
      if (b.contains(tok)) b(tok) += 1L
      else if (b.size < capacity) b(tok) = 1L
      else {
        // decrement-all: drop one occurrence of every tracked item and of
        // the incoming one (which is discarded) — the MG amortized step
        val dead = b.iterator.filter(_._2 == 1L).map(_._1).toList
        b.mapValuesInPlace((_, v) => v - 1L)
        dead.foreach(b.remove)
      }
      b
    }

    override def merge(a: mutable.Map[String, Long], c: mutable.Map[String, Long]): mutable.Map[String, Long] = {
      c.foreach { case (k, v) => a(k) = a.getOrElse(k, 0L) + v }
      if (a.size > capacity) {
        // trim to capacity by subtracting the (capacity+1)-th largest
        // count from every entry — the mergeable-summaries trim step
        val cut = a.values.toArray.sorted(Ordering[Long].reverse).apply(capacity)
        val dead = a.iterator.filter(_._2 <= cut).map(_._1).toList
        a.mapValuesInPlace((_, v) => v - cut)
        dead.foreach(a.remove)
      }
      a
    }

    override def finish(b: mutable.Map[String, Long]): MGSummary = MGSummary(b.toMap)

    override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
      Encoders.kryo[mutable.Map[String, Long]]
    override def outputEncoder: Encoder[MGSummary] = Encoders.product[MGSummary]
  }

  /** Exact heavy hitters of `tokCol`: items with count ≥ support·n.
    * Candidates come from a capacity-⌈2/support⌉ Misra-Gries pass
    * (guaranteed superset at that capacity); the verify pass re-counts
    * ONLY the candidates exactly. Output: (item, cnt), cnt exact. */
  def heavyHitters(df: DataFrame, tokCol: String, support: Double): DataFrame = {
    require(support > 0 && support < 1, "support must be in (0,1)")
    val spark = df.sparkSession
    import spark.implicits._
    val capacity = math.ceil(2.0 / support).toInt
    val toks = df.select(col(tokCol).cast("string").as("tok"))
    val mg = udaf(new MisraGries(capacity), Encoders.STRING)
    // one tiny driver-side row: the candidate set (≤capacity entries) and
    // the exact total n — both broadcast back into the verify pass
    val summary = toks.agg(mg(col("tok")).as("mg"), count(lit(1)).as("n"))
      .select(col("mg.items").as("cand"), col("n"))
    val row = summary.head()
    val cand = row.getMap[String, Long](0).keys.toSeq
    val n = row.getLong(1)
    val threshold = math.ceil(support * n).toLong
    val candDf = broadcast(cand.toDF("tok"))
    df.select(col(tokCol).cast("string").as("tok"))
      .join(candDf, Seq("tok"), "left_semi")
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
  }
}
