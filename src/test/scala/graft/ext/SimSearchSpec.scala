package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.SparkTestBase

class SimSearchSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.session
  import spark.implicits._

  val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),  // close to 0
    (2L, Array(0.0f, 1.0f, 0.0f)),  // orthogonal to 0
    (3L, Array(-1.0f, 0.0f, 0.0f)), // opposite of 0
    (4L, Array(0.5f, 0.5f, 0.0f)))
    .toDF("vec_id", "embedding")

  test("brute-force top-k ranks by cosine with deterministic ties") {
    val top = SimSearch.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 0), k = 4)
      .orderBy("rank").collect()
    assert(top.map(_.getLong(2)).toSeq == Seq(1L, 4L, 2L, 3L)) // by similarity
    val sims = top.map(_.getDouble(3))
    assert(math.abs(sims(0) - 0.9 / math.sqrt(0.81 + 0.01)) < 1e-9)
    assert(math.abs(sims(2) - 0.0) < 1e-12)
    assert(math.abs(sims(3) + 1.0) < 1e-12)
  }

  test("near-dup pairs apply the threshold exactly") {
    val pairs = SimSearch.nearDupPairs(vecs, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((0L, 1L))) // cos(0,1) ≈ 0.9939
  }

  test("LSH top-k returns a subset of brute-force with identical sims for shared hits") {
    val q = vecs.filter(col("vec_id") === 0)
    val brute = SimSearch.bruteForceTopK(vecs, q, 4)
      .collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap
    val lsh = SimSearch.lshTopK(vecs, q, 4, nPlanes = 4, dim = 3)
      .collect().map(r => r.getLong(2) -> r.getDouble(3))
    assert(lsh.nonEmpty) // the query's own bucket at least contains id 1 or 4
    lsh.foreach { case (id, sim) => assert(math.abs(sim - brute(id)) < 1e-12) }
  }

  test("lsh bucket assignment is deterministic") {
    val b1 = SimSearch.withLshBucket(vecs, nPlanes = 8, dim = 3).orderBy("vec_id")
      .select("lsh_bucket").collect().map(_.getLong(0)).toSeq
    val b2 = SimSearch.withLshBucket(vecs, nPlanes = 8, dim = 3).orderBy("vec_id")
      .select("lsh_bucket").collect().map(_.getLong(0)).toSeq
    assert(b1 == b2)
  }
}
