package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/**
 * Grouped top-k via a bounded-heap Aggregator — the scale path for
 * "top k per group" when k ≪ group size. The window formulation
 * (`row_number` ≤ k) shuffles and SORTS every row of every group; this
 * aggregator keeps only k candidates per group in the partial buffer, so
 * the map-side combine collapses each partition's contribution to k rows
 * and the shuffle carries |groups|·k, not |rows|. Semantically identical
 * to the window form — proven by the oracle query, whose SQL is the
 * window formulation.
 *
 * Ordering is (value DESC, id ASC) under SQL's total double order —
 * `java.lang.Double.compare` gives NaN > +Inf and -0.0 < 0.0, exactly
 * Spark's `ORDER BY v DESC, id` — so ties and IEEE specials rank
 * identically to the window formulation. Null-valued rows are excluded
 * by contract (a window rank would order them last).
 */
object TopK {

  type Entry = (Double, Long) // (value, id)

  private val ord: Ordering[Entry] = new Ordering[Entry] {
    override def compare(a: Entry, b: Entry): Int = {
      val c = java.lang.Double.compare(b._1, a._1) // v DESC, NaN first, -0.0 < 0.0
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  /** Bounded top-k aggregator: buffer is a sorted list of at most k
    * entries (k is small by contract — a list beats a heap's constant
    * factor and serializes trivially). */
  class TopKAgg(k: Int) extends Aggregator[Entry, List[Entry], Seq[Entry]] {
    override def zero: List[Entry] = Nil
    override def reduce(buf: List[Entry], e: Entry): List[Entry] =
      insert(buf, e)
    override def merge(a: List[Entry], b: List[Entry]): List[Entry] =
      b.foldLeft(a)(insert)
    override def finish(buf: List[Entry]): Seq[Entry] = buf
    private def insert(buf: List[Entry], e: Entry): List[Entry] = {
      val merged = (e :: buf).sorted(ord)
      if (merged.length > k) merged.take(k) else merged
    }
    override def bufferEncoder: Encoder[List[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Entry]]()
    override def outputEncoder: Encoder[Seq[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
  }

  /** Top-k rows per group: returns (groupCols*, rank, id, v) with rank
    * 1..k by (v DESC, id ASC). Rows with a null id or value are excluded
    * up front — the primitive tuple encoder would otherwise coerce them
    * to 0 silently. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
      idCol: String, valCol: String, k: Int): DataFrame = {
    val agg = udaf(new TopKAgg(k), Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
    val grouped = df.filter(col(idCol).isNotNull && col(valCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(agg(col(valCol).cast("double"), col(idCol).cast("long")).as("topk"))
    grouped.select(
      groupCols.map(col) :+ posexplode(col("topk")).as(Seq("pos", "entry")): _*)
      .select(
        groupCols.map(col) ++ Seq(
          (col("pos") + 1).cast("int").as("rank"),
          col("entry._2").as(idCol),
          col("entry._1").as(valCol)): _*)
  }
}
