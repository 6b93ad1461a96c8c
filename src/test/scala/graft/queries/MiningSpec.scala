package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestBase}

/** Value-level checks for the pattern-mining family against brute-force
  * driver-side recomputation at sf0.001 (the DuckDB oracle covers the
  * cross-engine contract; this covers the math itself). */
class MiningSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.session
  val sf = SparkTestBase.sf0001

  test("basket pairs match brute-force pair counting") {
    val got = SparkEntry.queries("q_basket_pairs")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = li.groupBy(_._1).values.flatMap { basket =>
      val parts = basket.map(_._2).sorted
      for { i <- parts.indices; j <- i + 1 until parts.length }
        yield (parts(i), parts(j))
    }.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 2).toMap
    assert(got === brute)
  }

  test("association rules: confidence and lift from exact counts") {
    val rules = SparkEntry.queries("q_basket_rules")(spark, sf).collect()
    assert(rules.nonEmpty)
    rules.foreach { r =>
      val (nAb, nAnte, nCons) = (r.getLong(2), r.getLong(3), r.getLong(4))
      val (conf, lift) = (r.getDouble(5), r.getDouble(6))
      assert(nAb <= nAnte && nAb <= nCons)
      assert(conf === nAb.toDouble / nAnte)
      assert(conf > 0 && conf <= 1.0)
      assert(lift > 0)
    }
    // both directions of each pair present, same n_ab
    val byPair = rules.groupBy(r => Set(r.getLong(0), r.getLong(1)))
    assert(byPair.values.forall(_.length == 2))
    assert(byPair.values.forall(g => g.map(_.getLong(2)).distinct.length == 1))
  }

  test("per-label covariance matches sequential computation") {
    val got = SparkEntry.queries("q_embed_covariance")(spark, sf).collect()
    val raw = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("label").cast("int") +:
        (0 until 4).map(i => element_at(col("embedding"), i + 1).cast("double")): _*)
      .collect()
      .map(r => r.getInt(0) -> (1 to 4).map(r.getDouble))
      .groupBy(_._1)
    got.foreach { row =>
      val vecs = raw(row.getInt(0)).map(_._2)
      val n = vecs.length.toDouble
      assert(row.getLong(1) === vecs.length)
      for (i <- 0 until 4) {
        val mi = vecs.map(_(i)).sum / n
        assert(math.abs(row.getDouble(2 + i) - mi) < 1e-6, s"mean dim $i")
      }
      var c = 2 + 4
      for { i <- 0 until 4; j <- i until 4 } {
        val mi = vecs.map(_(i)).sum / n
        val mj = vecs.map(_(j)).sum / n
        val cov = vecs.map(v => v(i) * v(j)).sum / n - mi * mj
        assert(math.abs(row.getDouble(c) - cov) < 1e-6, s"cov($i,$j)")
        c += 1
      }
    }
  }

  test("bloom semi-join plan: broadcast probes, no sort-merge join") {
    val plan = SparkEntry.queries("q_bloom_semijoin")(spark, sf)
      .queryExecution.executedPlan.toString
    // 3 probe joins + 1 exact-verify join, all broadcast — the orders
    // side never shuffles before its final aggregation
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 4, plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
