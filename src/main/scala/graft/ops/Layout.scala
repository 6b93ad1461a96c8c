package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Physical-layout keys for multi-dimensional data clustering — the
 * Z-ORDER/space-filling-curve half of a lakehouse writer, expressed as
 * plain column arithmetic so it runs inside whole-stage codegen and an
 * oracle engine can reproduce it bit-for-bit.
 *
 * Why it matters at 100 TB: parquet min/max pruning is one-dimensional —
 * sorting by `(a, b)` clusters `a` but scatters `b`, so predicates on `b`
 * read every file. A Morton (bit-interleaved) key gives every sorted run
 * locality in BOTH dimensions at once: `repartitionByRange(mortonKey)`
 * followed by a sorted write yields files whose min/max ranges are tight
 * on `a` AND `b`, so a scan with either predicate prunes most files. This
 * is what `OPTIMIZE ... ZORDER BY` does in lakehouse table formats,
 * reduced to its engine primitive: a deterministic sort key.
 */
object Layout {

  /**
   * Morton (Z-order) key: interleave the low `bits` bits of two
   * non-negative int columns — bit j of `a` lands at position 2j, bit j of
   * `b` at 2j+1. Pure shift/mask arithmetic (codegen-friendly, no UDF);
   * 2·bits ≤ 62 keeps the key in a long.
   */
  def mortonKey(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "1..31 interleaved bits per column")
    (0 until bits).map { j =>
      val aj = shiftleft(shiftright(a.cast("long"), j).bitwiseAND(lit(1L)), 2 * j)
      val bj = shiftleft(shiftright(b.cast("long"), j).bitwiseAND(lit(1L)), 2 * j + 1)
      aj.bitwiseOR(bj)
    }.reduce(_.bitwiseOR(_))
  }

  /** The same key as SQL text (for oracle engines / EXPLAIN parity). The
    * operands are cast to BIGINT like [[mortonKey]] casts to long — on a
    * 32-bit column, `1 << 31` would otherwise overflow (error in DuckDB,
    * silent negative wrap in Spark SQL) once bit 15 of `b` is populated. */
  def mortonKeySql(a: String, b: String, bits: Int = 16): String =
    (0 until bits).map { j =>
      s"(((CAST($a AS BIGINT) >> $j) & 1) << ${2 * j})" +
        s" | (((CAST($b AS BIGINT) >> $j) & 1) << ${2 * j + 1})"
    }.mkString("(", " | ", ")")

  /**
   * Cluster a frame for a sorted multi-dimensional write: range-partition
   * by the Morton key of (a, b), sort within partitions. Each output file
   * then covers a compact Z-curve segment — tight min/max on both columns.
   * `numPartitions` ≈ target file count (size-driven at scale).
   */
  def zorderCluster(df: DataFrame, a: String, b: String,
      numPartitions: Int, bits: Int = 16): DataFrame = {
    val keyed = df.withColumn("__zkey", mortonKey(col(a), col(b), bits))
    keyed.repartitionByRange(numPartitions, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
  }
}
