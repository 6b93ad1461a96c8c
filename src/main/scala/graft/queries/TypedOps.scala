package graft.queries

import org.apache.spark.sql.functions._

import QueryUtil._

/**
 * Typed Dataset API coverage: `Dataset[T]` with case-class Encoders,
 * `groupByKey` + `cogroup` — the batch half of the typed surface (the
 * streaming half, `mapGroupsWithState`/`flatMapGroupsWithState`, lives in
 * `streaming/EventStreams`). The reference's per-row Python validation
 * loops (`test_data.py`) are this shape: imperative logic over one key
 * group at a time, which Spark expresses as a typed cogroup rather than a
 * driver-side collect.
 *
 * Scale shape: cogroup co-partitions both sides with ONE hash shuffle on
 * the key and streams each key's two iterators through the lambda — state
 * is one group, never a partition. The tradeoff vs the equivalent
 * join+groupBy: typed lambdas are opaque to Catalyst (no codegen, no
 * pushdown through the lambda), so this path is reserved for logic the
 * relational surface can't express; the oracle here deliberately IS
 * SQL-expressible so the typed path can be hash-verified against it.
 */
object TypedOps {

  final case class OrderRow(o_orderkey: Long, o_totalprice: Double)
  final case class LineRow(l_orderkey: Long, l_extendedprice: Double,
      l_discount: Double, l_tax: Double)
  final case class OrderRecon(o_orderkey: Long, o_totalprice: Double,
      n_lines: Long, charge: Option[Double])

  /**
   * Order/lineitem reconciliation through typed cogroup: for every order,
   * the line count and the exact-decimal total charge
   * Σ extprice·(1−disc)·(1+tax). Per-group arithmetic uses BigDecimal —
   * `BigDecimal.valueOf(double)` recovers the exact 2-dp factors (the
   * shortest-decimal representation, same values DuckDB's
   * DECIMAL(18,2) cast produces), products are exact scale-6 rationals,
   * and the final correctly-rounded `doubleValue` matches DuckDB's
   * decimal→double cast while the scaled sums stay far below 2^53.
   * Orders with no lines surface with n_lines = 0 and a null charge;
   * orphan line groups (no order row) emit nothing — LEFT JOIN semantics.
   */
  private val cogroupRecon = Q(
    "q_cogroup_recon",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice")).as[OrderRow]
      val lines = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")).as[LineRow]
      val one = java.math.BigDecimal.ONE
      orders.groupByKey(_.o_orderkey)
        .cogroup(lines.groupByKey(_.l_orderkey)) { (key, os, ls) =>
          val orderRows = os.toSeq
          if (orderRows.isEmpty) Iterator.empty
          else {
            var n = 0L
            var sum: java.math.BigDecimal = null
            ls.foreach { l =>
              n += 1
              val term = java.math.BigDecimal.valueOf(l.l_extendedprice)
                .multiply(one.subtract(java.math.BigDecimal.valueOf(l.l_discount)))
                .multiply(one.add(java.math.BigDecimal.valueOf(l.l_tax)))
              sum = if (sum == null) term else sum.add(term)
            }
            val charge = Option(sum).map(_.doubleValue())
            orderRows.iterator.map(o => OrderRecon(key, o.o_totalprice, n, charge))
          }
        }
        .toDF()
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_totalprice,
           |  COUNT(l_orderkey) AS n_lines,
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           |    * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))
           |    * (CAST(1.00 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE)
           |    AS charge
           |FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
           |GROUP BY o_orderkey, o_totalprice
           |ORDER BY o_orderkey""".stripMargin))

  val all: Seq[Q] = Seq(cogroupRecon)
}
