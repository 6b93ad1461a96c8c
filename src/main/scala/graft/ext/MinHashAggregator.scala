package graft.ext

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/**
 * Typed MinHash aggregator: folds a document's 31-bit shingle hashes into
 * one k-long signature buffer (k mins in a single mutable array) instead
 * of k separate min() aggregate expressions. Same math as the expression
 * pipeline — h_i(x) = (a_i*x + b_i) mod p, p = 2^31-1 — so signatures are
 * bit-identical; the win is one aggregate buffer and one tight JVM loop
 * per row instead of k codegen'd aggregate slots (SURVEY §4 named this
 * Aggregator as the escape hatch if the expression pipeline is slow).
 */
final class MinHashAggregator(coefA: Array[Long], coefB: Array[Long], prime: Long)
    extends Aggregator[Long, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(coefA.length)(Long.MaxValue)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var i = 0
    while (i < coefA.length) {
      val v = (h * coefA(i) + coefB(i)) % prime // inputs non-negative: % == mod
      if (v < buf(i)) buf(i) = v
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Array[Long] = r
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
