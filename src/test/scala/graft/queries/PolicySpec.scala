package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestBase}

/** Value-level checks for the corpus-policy operators added in round 5:
  * canonical-survivor selection and mixture upsampling. */
class PolicySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.session
  val sf = SparkTestBase.sf0001

  test("canonical survivor is the longest member of its own cluster") {
    val assign = SparkEntry.queries("q_dedup_canonical")(spark, sf).collect()
    assert(assign.nonEmpty)
    val lens = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byCluster = assign.groupBy(_.getLong(1))
    byCluster.values.foreach { members =>
      val canon = members.head.getLong(2)
      assert(members.forall(_.getLong(2) == canon), "mixed canonicals in one cluster")
      assert(members.exists(_.getLong(0) == canon), "canonical outside its cluster")
      val best = members.map(m => (lens(m.getLong(0)), -m.getLong(0))).max
      assert((lens(canon), -canon) === best, "canonical is not the longest member")
    }
  }

  test("upsample repeats land between floor(w) and ceil(w) with exact doc coverage") {
    val got = SparkEntry.queries("q_upsample_mix")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val counts = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val w = Map("en" -> 1.0, "de" -> 2.5, "fr" -> 2.0, "es" -> 1.75, "zh" -> 3.25)
    counts.foreach { case (lang, n) =>
      val (nDocs, nCopies) = got(lang)
      assert(nDocs === n, s"$lang: every doc must appear (no downsampling)")
      val wt = w.getOrElse(lang, 1.0)
      assert(nCopies >= math.floor(wt).toLong * n && nCopies <= math.ceil(wt).toLong * n,
        s"$lang: $nCopies copies outside [${math.floor(wt) * n}, ${math.ceil(wt) * n}]")
    }
    // integral weights are exact, not stochastic
    assert(got("en")._2 === counts("en"))
    assert(got("fr")._2 === 2 * counts("fr"))
  }

  test("entity resolution: entity id is the minimum member, counts consistent") {
    // sf0.001 blocks are too sparse for any >=0.8 match; use sf0.01
    val assign = SparkEntry.queries("q_entity_resolution")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(assign.nonEmpty)
    val byEntity = assign.groupBy(_.getLong(1))
    byEntity.foreach { case (eid, members) =>
      assert(members.map(_.getLong(0)).min === eid, "entity id must be the min member")
      assert(members.forall(_.getLong(2) == members.length), "n_members mismatch")
      assert(members.length >= 2, "singletons should not appear (edge-derived nodes only)")
    }
  }

  test("poisson bootstrap: replica means bracket the true mean at the right scale") {
    val reps = SparkEntry.queries("q_bootstrap_means")(spark, sf).collect()
    assert(reps.length === 32)
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_totalprice").collect().map(_.getDouble(0))
    val n = orders.length
    val mean = orders.sum / n
    val sd = math.sqrt(orders.map(x => (x - mean) * (x - mean)).sum / n)
    val se = sd / math.sqrt(n.toDouble)
    // Poisson(1) weights: E[n_eff] = n, Var[mean_b] ~ se^2
    reps.foreach { r =>
      assert(math.abs(r.getLong(1) - n) < 0.2 * n, "n_eff far from n")
      assert(math.abs(r.getDouble(2) - mean) < 6 * se, "replica mean implausibly far")
    }
    val bmeans = reps.map(_.getDouble(2))
    val bsd = {
      val m = bmeans.sum / bmeans.length
      math.sqrt(bmeans.map(x => (x - m) * (x - m)).sum / bmeans.length)
    }
    assert(bsd > 0.2 * se && bsd < 5 * se,
      s"bootstrap spread $bsd inconsistent with true SE $se")
  }

  test("upsample is deterministic across invocations") {
    val a = SparkEntry.queries("q_upsample_mix")(spark, sf).collect().toSeq
    val b = SparkEntry.queries("q_upsample_mix")(spark, sf).collect().toSeq
    assert(a === b)
  }
}
