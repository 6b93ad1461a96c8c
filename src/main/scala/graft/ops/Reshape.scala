package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Structural reshaping operators from the reference's ingest path.
 */
object Reshape {

  /**
   * One-level JSON flatten with prefixed nested structs (reference
   * custom_functions.py:10-18, SURVEY §2.1 O2): lift `structCol.*` to the
   * top level; any struct field *inside* it is lifted one more level with
   * a `<field>_` prefix (`result.codes.x` → `codes_x`). Generic over the
   * actual StructType — schema drift in the nested payload flows through.
   */
  def flattenOneLevel(df: DataFrame, structCol: String): DataFrame = {
    val structType = df.schema(structCol).dataType match {
      case s: StructType => s
      case other => throw new IllegalArgumentException(
        s"$structCol is ${other.simpleString}, expected struct")
    }
    val cols: Seq[Column] = structType.fields.toSeq.flatMap { f =>
      f.dataType match {
        case inner: StructType =>
          inner.fields.toSeq.map(g =>
            col(s"`$structCol`.`${f.name}`.`${g.name}`").as(s"${f.name}_${g.name}"))
        case _ => Seq(col(s"`$structCol`.`${f.name}`").as(f.name))
      }
    }
    val keep = df.columns.filterNot(_ == structCol).map(c => col(s"`$c`")).toSeq
    df.select(keep ++ cols: _*)
  }

  /**
   * Exact contiguous 0..n-1 row index in a given order (reference
   * write_data_to_land.py:39, O3). `monotonically_increasing_id` is
   * NOT contiguous across partitions; `zipWithIndex` is, with one extra
   * job to count partition sizes — acceptable for ingest-sized frames,
   * deliberate for 100 TB (a global contiguous index is inherently a
   * sequential contract; prefer partition-local ids at scale).
   */
  def withRowIndex(df: DataFrame, indexCol: String = "index", order: Seq[Column] = Nil): DataFrame = {
    val ordered = if (order.nonEmpty) df.orderBy(order: _*) else df
    val schema = ordered.schema.add(indexCol, org.apache.spark.sql.types.LongType, nullable = false)
    ordered.sparkSession.createDataFrame(
      ordered.rdd.zipWithIndex.map { case (r, i) => org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i) },
      schema)
  }
}
