package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.SparkTestBase

class IvfSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.session

  test("IVF top-k: valid ranks, sims identical to brute force, nonzero recall") {
    val emb = spark.read.parquet(s"${SparkTestBase.sf0001}/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 5)
    val brute = SimSearch.bruteForceTopK(emb, queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val bruteAll = SimSearch.bruteForceTopK(emb, queries, 5)
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap

    val ivf = SimSearch.ivfTopK(emb, queries, topK = 5, k = 8, nprobe = 3).collect()
    // per-query ranks are 1..n without gaps
    ivf.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to rows.length))
    }
    // any neighbor IVF returns that brute force also ranked must carry the
    // exact same similarity (same vec_dot formula end-to-end)
    ivf.foreach { r =>
      brute.get((r.getLong(0), r.getLong(2))).foreach(b => assert(r.getDouble(3) == b))
    }
    // probing 3/8 clusters still finds a nonzero share of true top-5
    val hits = ivf.count(r => bruteAll(r.getLong(0)).contains(r.getLong(2)))
    assert(hits > 0, s"IVF found none of the true top-5 (${ivf.length} rows returned)")
  }

  test("a persisted index searches identically to the inline build, without rebuilding") {
    val emb = spark.read.parquet(s"${SparkTestBase.sf0001}/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 5)
    val idx = java.nio.file.Files.createTempDirectory("ivf-index").toString
    SimSearch.buildIvfIndex(emb, idx, k = 8)
    // the partitioned layout: one directory per cluster, probes prune to nprobe of them
    val parts = new java.io.File(s"$idx/assigned").listFiles()
      .filter(_.getName.startsWith("cluster=")).map(_.getName).toSet
    assert(parts.nonEmpty && parts.size <= 8)

    val inline = SimSearch.ivfTopK(emb, queries, topK = 5, k = 8, nprobe = 3)
      .collect().map(_.toSeq).toSeq
    val indexed = SimSearch.ivfTopKIndexed(spark, idx, queries, topK = 5, nprobe = 3)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    assert(indexed === inline.sortBy(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Int])))
  }

  test("ensureIvfIndex: builds once, reuses on same corpus, rebuilds on corpus change") {
    val emb = spark.read.parquet(s"${SparkTestBase.sf0001}/embeddings.parquet")
    val idx = java.nio.file.Files.createTempDirectory("ivf-ensure").toString
    assert(SimSearch.ensureIvfIndex(emb, idx, k = 8))        // first: builds
    assert(!SimSearch.ensureIvfIndex(emb, idx, k = 8))       // unchanged: reuses
    assert(SimSearch.ensureIvfIndex(emb, idx, k = 4))        // different k: rebuilds
    // a changed corpus at the same path must NOT be served stale results
    val changed = emb.filter(col("vec_id") % 7 =!= 0)
    assert(SimSearch.ensureIvfIndex(changed, idx, k = 4))
    val out = SimSearch.ivfTopKIndexed(spark, idx,
      changed.filter(col("vec_id") < 5), topK = 3, nprobe = 2).collect()
    assert(out.forall(_.getLong(2) % 7 != 0), "stale index served a dropped row")
  }

  test("crash between build and marker-write: next run rebuilds (marker is written last)") {
    val emb = spark.read.parquet(s"${SparkTestBase.sf0001}/embeddings.parquet")
    val idx = java.nio.file.Files.createTempDirectory("ivf-crash").toString
    assert(SimSearch.ensureIvfIndex(emb, idx, k = 4))
    // Poisoned rebuild: vecCol of scalar type passes the fingerprint scan
    // (it only casts to string) but blows up inside buildIvfIndex — i.e.
    // the process "dies" after invalidation, before the marker write.
    intercept[Exception] {
      SimSearch.ensureIvfIndex(emb, idx, k = 4, vecCol = "vec_id")
    }
    val marker = new java.io.File(s"$idx/fingerprint")
    assert(!marker.exists(), "a failed rebuild must not leave a marker behind")
    // and therefore the next healthy run rebuilds rather than serving the
    // half-written index
    assert(SimSearch.ensureIvfIndex(emb, idx, k = 4))
    assert(marker.exists())
  }

  test("ensureIvfIndexAppended: append covers the batch, reuses when fresh, rebuilds on batch change") {
    val emb = spark.read.parquet(s"${SparkTestBase.sf0001}/embeddings.parquet")
    val base = emb.filter(col("vec_id") % 5 =!= 0)
    val batch = emb.filter(col("vec_id") % 5 === 0)
    val idx = java.nio.file.Files.createTempDirectory("ivf-append").toString
    assert(SimSearch.ensureIvfIndexAppended(base, batch, idx, k = 8)) // builds + appends
    // the appended index holds EXACTLY base ∪ batch, each row once
    val assigned = spark.read.parquet(s"$idx/assigned")
    assert(assigned.count() == emb.count())
    assert(assigned.select("neighbor_id").distinct().count() == emb.count())
    // centroids stay the BASE build's (append must not recluster)
    val centCount = spark.read.parquet(s"$idx/centroids").count()
    assert(centCount <= 8)
    // fresh markers: a re-invocation is a no-op
    assert(!SimSearch.ensureIvfIndexAppended(base, batch, idx, k = 8))
    // searching the appended index can return batch members as neighbors
    val out = SimSearch.ivfTopKIndexed(spark, idx,
      emb.filter(col("vec_id") < 5), topK = 5, nprobe = 4).collect()
    assert(out.nonEmpty)
    // a CHANGED batch at the same path forces rebuild+re-append (a dirty
    // parquet append cannot be rolled back row-by-row)
    val batch2 = batch.filter(col("vec_id") % 10 === 0)
    assert(SimSearch.ensureIvfIndexAppended(base, batch2, idx, k = 8))
    val assigned2 = spark.read.parquet(s"$idx/assigned")
    assert(assigned2.count() == base.count() + batch2.count())
    // an appended index must NEVER satisfy a plain base-only freshness
    // check (it holds base ∪ batch): ensureIvfIndex(base) rebuilds
    assert(SimSearch.ensureIvfIndex(base, idx, k = 8))
    assert(spark.read.parquet(s"$idx/assigned").count() == base.count())
  }

  test("ivfAssign: every vector gets exactly one cluster in [0, k)") {
    val emb = spark.read.parquet(s"${SparkTestBase.sf0001}/embeddings.parquet")
    val assigned = SimSearch.ivfAssign(emb, k = 8)
    assert(assigned.count() == emb.count())
    val clusters = assigned.select("cluster").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(clusters.subsetOf((0 until 8).toSet))
  }
}
