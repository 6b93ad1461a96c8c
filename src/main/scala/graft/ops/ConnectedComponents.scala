package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Connected components by alternating LARGE-STAR / SMALL-STAR rounds
 * (Kiveris et al., "Connected Components in MapReduce and Beyond") — the
 * scale upgrade over min-label propagation
 * ([[graft.ext.Dedup.clusterAssignments]]): propagation needs
 * O(component diameter) rounds, so a 10⁶-node chain needs 10⁶ joins;
 * star contraction converges in O(log²) rounds on ANY topology, because
 * each round rewires whole neighborhoods to their minimum instead of
 * moving labels one hop.
 *
 * Both operations are one groupBy + one join per round over the edge
 * list (shuffle ∝ |E|), with each round's result locally checkpointed so
 * lineage stays flat. Convergence = canonical edge-set checksum
 * unchanged; at the fixed point every component is a star centered on
 * its minimum node.
 */
object ConnectedComponents {

  /** (node, component) for every node appearing in `pairs`; component id
    * is the smallest node id of the component. */
  def largeStarSmallStar(pairs: DataFrame, d1: String = "d1", d2: String = "d2",
      maxIterations: Int = 32): DataFrame = {
    val spark = pairs.sparkSession

    def canon(e: DataFrame): DataFrame = e
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .distinct()

    def bidir(e: DataFrame): DataFrame =
      e.union(e.select(col("v").as("u"), col("u").as("v")))

    // min(N(u) ∪ {u}) per node
    def mins(adj: DataFrame): DataFrame =
      adj.groupBy("u").agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))

    def largeStar(e: DataFrame): DataFrame = {
      val adj = bidir(e)
      canon(adj.join(mins(adj), "u").filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")))
    }

    def smallStar(e: DataFrame): DataFrame = {
      val adj = bidir(e)
      val withM = adj.join(mins(adj), "u")
      canon(
        withM.filter(col("v") < col("u"))
          .select(col("v").as("u"), col("m").as("v"))
          .union(withM.select(col("u"), col("m").as("v"))))
    }

    def checksum(e: DataFrame): (Long, BigDecimal) = {
      // decimal sum: a long sum of 64-bit hashes overflows under ANSI
      val r = e.agg(count(lit(1)),
        coalesce(sum(xxhash64(col("u"), col("v"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0))),
          lit(BigDecimal(0)))).collect()(0)
      (r.getLong(0), BigDecimal(r.getDecimal(1)))
    }

    val raw = pairs.select(col(d1).cast("long").as("u"), col(d2).cast("long").as("v"))
    var edges = canon(raw).localCheckpoint()
    // node universe from the RAW pairs: canon drops self-loops, and a node
    // appearing only as (x, x) must still come back labeled (x, x)
    val nodes = bidir(raw).select(col("u").as("id")).distinct().localCheckpoint()

    var prev = checksum(edges)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      edges = smallStar(largeStar(edges)).localCheckpoint(false)
      val cur = checksum(edges)
      converged = cur == prev
      prev = cur
      iter += 1
    }
    if (!converged) throw new IllegalStateException(
      s"largeStarSmallStar did not converge in $maxIterations rounds")

    // fixed point = stars around each component's minimum: every non-root
    // node has exactly the edge (root, node); roots label themselves
    val labels = bidir(edges).groupBy("u")
      .agg(min(col("v")).as("mv"))
      .select(col("u").as("id"), least(col("u"), col("mv")).as("component"))
    nodes.join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
  }
}
