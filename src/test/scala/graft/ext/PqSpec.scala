package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class PqSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.session
  private def emb = spark.read.parquet(s"${SparkTestBase.sf0001}/embeddings.parquet")

  test("codes are the compressed state: m entries per vector, cid < ks") {
    val (codes, codebook) = Pq.trainEncode(emb, m = 8, ks = 16)
    val n = emb.count()
    assert(codes.count() === n * 8)
    assert(codes.groupBy("id").count().filter(col("count") =!= 8).count() === 0)
    assert(codes.filter(col("cid") < 0 || col("cid") >= 16).count() === 0)
    assert(codebook.count() <= 8L * 16)
    // every codebook entry is a full subvector
    assert(codebook.filter(size(col("cv")) =!= 8).count() === 0)
  }

  test("with a corpus-wide candidate pool the exact re-rank equals brute force") {
    val q = emb.filter(col("vec_id") < 5)
    val n = emb.count().toInt
    val pq = Pq.pqTopK(emb, q, topK = 3, m = 8, ks = 16, candidates = n)
      .orderBy("query_id", "rank").collect()
    val bf = SimSearch.bruteForceTopK(emb, q, k = 3)
      .orderBy("query_id", "rank").collect()
    assert(pq === bf)
  }

  test("IVF+PQ with a pool-wide candidate budget equals plain IVF (composition glue is lossless)") {
    val q = emb.filter(col("vec_id") < 5)
    val n = emb.count().toInt
    // exact re-rank of EVERY vector in the probed cells == ivfTopK's
    // exact ranking of those same cells: only the PQ candidate cut can
    // differ, and a corpus-wide budget removes it
    val composed = Pq.ivfPqTopK(emb, q, topK = 3, kIvf = 8, nprobe = 2,
      m = 8, ks = 16, candidates = n)
      .orderBy("query_id", "rank").collect()
    val ivf = SimSearch.ivfTopK(emb, q, topK = 3, k = 8, nprobe = 2)
      .orderBy("query_id", "rank").collect()
    assert(composed === ivf)
  }

  test("ADC with a bounded pool keeps nonzero overlap with true top-k (fixture floor)") {
    val q = emb.filter(col("vec_id") < 5)
    val pq = Pq.pqTopK(emb, q, topK = 5, m = 8, ks = 16, candidates = 50)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = SimSearch.bruteForceTopK(emb, q, k = 5)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (pq intersect bf).size.toDouble / bf.size
    // the sf0.001 fixture's embeddings are near-random (cosine spread is
    // tight), the worst case for PQ distortion — still demand real signal
    assert(recall >= 0.4, s"recall@5 = $recall")
  }

  test("a persisted IVF+PQ index searches identically to the inline build, and reuses") {
    val q = emb.filter(col("vec_id") < 5)
    val idx = java.nio.file.Files.createTempDirectory("ivfpq-index").toString
    assert(Pq.ensureIvfPqIndex(emb, idx, kIvf = 8, m = 8, ks = 16))   // builds
    assert(!Pq.ensureIvfPqIndex(emb, idx, kIvf = 8, m = 8, ks = 16))  // reuses
    // the cluster-partitioned code layout: probes prune to nprobe directories
    val parts = new java.io.File(s"$idx/codes").listFiles()
      .filter(_.getName.startsWith("cluster=")).map(_.getName).toSet
    assert(parts.nonEmpty && parts.size <= 8)
    val inline = Pq.ivfPqTopK(emb, q, topK = 3,
        kIvf = 8, nprobe = 3, m = 8, ks = 16, candidates = 20)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    val indexed = Pq.ivfPqTopKIndexed(spark, idx, q, topK = 3,
        nprobe = 3, candidates = 20)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    assert(indexed === inline)
  }
}
