package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.session
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.largeStarSmallStar(edges.toDF("d1", "d2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chains, stars, cliques, singleton edges: component = min node id") {
    // 0-1-2-3-4 chain (diameter 4), star at 10, triangle 20-21-22, pair 30-31
    val got = run(Seq(
      (0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (10L, 12L), (10L, 13L),
      (20L, 21L), (21L, 22L), (20L, 22L),
      (30L, 31L)))
    assert((0L to 4L).forall(got(_) == 0L))
    assert(Seq(10L, 11L, 12L, 13L).forall(got(_) == 10L))
    assert(Seq(20L, 21L, 22L).forall(got(_) == 20L))
    assert(got(30L) == 30L && got(31L) == 30L)
  }

  test("self-loop-only nodes still come back labeled with themselves") {
    val got = run(Seq((5L, 5L), (1L, 2L)))
    assert(got === Map(5L -> 5L, 1L -> 1L, 2L -> 1L))
  }

  test("long chain converges in O(log^2) rounds where propagation needs O(n)") {
    val chain = (0L until 200L).map(i => (i, i + 1))
    val got = run(chain)
    assert(got.size == 201)
    assert(got.values.forall(_ == 0L))
  }

  test("seeded random graphs agree with min-label propagation") {
    val rnd = new scala.util.Random(23)
    val edges = (1 to 300).map(_ => (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
    val lss = run(edges)
    val prop = graft.ext.Dedup.clusterAssignments(edges.toDF("d1", "d2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lss === prop)
  }
}
