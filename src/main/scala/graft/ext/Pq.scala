package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.functions.VectorFunctions

/**
 * Product-quantized ANN (Jégou et al. 2011, "Product Quantization for
 * Nearest Neighbor Search") — the MEMORY-side scale path that composes
 * with the IVF partition pruning in [[SimSearch]]: a d-dim float vector
 * becomes m sub-codes (one nearest-centroid id per d/m-dim subspace), so
 * the searchable corpus state shrinks from d doubles to m small ints per
 * vector (64-dim → 8 bytes here, a 64× reduction) and the scan side of a
 * query touches codes only — full vectors are fetched just for the final
 * exact re-rank of a bounded candidate set.
 *
 * Determinism contract: the per-subspace codebooks use the exact seeded
 * init + one Lloyd step of [[SimSearch.ivfAssign]] (md5-ordered pick,
 * exact-decimal centroid means), so codes, candidates, and the re-ranked
 * output are reproducible bit-for-bit across runs and partitionings. The
 * re-rank computes EXACT cosine on candidates, so with a generous
 * candidate pool the output equals brute-force top-k and hash-checks
 * against the same portable SQL oracle (recall is pinned by PqSpec).
 *
 * Scale shape: codebook training is corpus × m subvector rows with
 * broadcast (m·ks)-row codebooks — at 100 TB you train on a sample, the
 * plan is unchanged. ADC scoring joins the code table to the broadcast
 * per-query lookup tables on (sub, cid) and aggregates m partial dots
 * per (query, vector): shuffle ∝ corpus·m, never corpus². Re-rank joins
 * only |queries|·candidates rows back to full vectors.
 */
object Pq {

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** (id, sub, sv): the corpus split into m contiguous subvectors. */
  private def subvectors(base: DataFrame, m: Int, subDim: Int): DataFrame =
    base.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(m - 1)),
        s => slice(col("v"), s * subDim + 1, lit(subDim)))).as(Seq("sub", "sv")))

  /** Nearest codebook entry per (id, sub) — same d² = |p|²−2p·c+|c|²
    * ranking as the IVF assign, per subspace. */
  private def nearestCode(subs: DataFrame, codebook: DataFrame): DataFrame =
    subs.join(broadcast(codebook), "sub")
      .withColumn("d2",
        VectorFunctions.vecDotExpr("sv", "sv")
          - lit(2.0) * VectorFunctions.vecDotExpr("sv", "cv")
          + VectorFunctions.vecDotExpr("cv", "cv"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("id", "sub").orderBy(col("d2"), col("cid"))))
      .filter(col("rn") === 1)
      .select("id", "sub", "cid", "sv")

  /** Train per-subspace codebooks (seeded init + one exact-decimal Lloyd
    * step) and encode the corpus: returns (codes, codebook) where codes =
    * (id, sub, cid) and codebook = (sub, cid, cv). */
  def trainEncode(corpus: DataFrame, m: Int, ks: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): (DataFrame, DataFrame) = {
    val spark = corpus.sparkSession
    VectorFunctions.register(spark)
    val base = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val d = base.select(size(col("v"))).head().getInt(0)
    require(d % m == 0, s"dim $d not divisible by m=$m")
    val subDim = d / m
    val subs = graft.ops.BoundedCache.cached(subvectors(base, m, subDim))
    // seeded init: the ks md5-first ids seed EVERY subspace (one pick,
    // broadcast) — the same portable ordering as SimSearch.ivfAssign.
    // The unpartitioned row_number window below runs AFTER limit(ks):
    // WindowExec's single-partition warning is about these ≤ks (16)
    // seed rows, bounded by design, never the corpus.
    val initIds = base
      .orderBy(md5(col("id").cast("string")), col("id")).limit(ks)
      .withColumn("cid",
        row_number().over(Window.orderBy(md5(col("id").cast("string")), col("id"))) - 1)
      .select("id", "cid")
    val codebook0 = subs.join(broadcast(initIds), "id")
      .select(col("sub"), col("cid"), col("sv").as("cv"))
    // one Lloyd step: exact-decimal elementwise means per (sub, cid, dim)
    val assigned0 = nearestCode(subs, codebook0)
    val codebook = assigned0
      .select(col("sub"), col("cid"), posexplode(col("sv")).as(Seq("dim", "x")))
      .groupBy("sub", "cid", "dim")
      .agg((sum(col("x").cast(DecimalType(28, 12))).cast(DoubleType)
        / count(lit(1))).as("mu"))
      .groupBy("sub", "cid").agg(
        transform(array_sort(collect_list(struct(col("dim"), col("mu")))),
          s => s.getField("mu")).as("cv"))
    val codes = nearestCode(subs, codebook).select("id", "sub", "cid")
    (codes, codebook)
  }

  /**
   * PQ top-k: ADC (asymmetric distance computation) over the code table
   * picks `candidates` per query, then an EXACT cosine re-rank of those
   * candidates yields the final top-k — (query_id, rank, neighbor_id,
   * sim) with exact sims.
   */
  def pqTopK(corpus: DataFrame, queries: DataFrame, topK: Int,
      m: Int = 8, ks: Int = 16, candidates: Int = 50,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    VectorFunctions.register(spark)
    val (codes, codebook) = trainEncode(corpus, m, ks, idCol, vecCol)
    val d = corpus.select(size(col(vecCol))).head().getInt(0)
    val subDim = d / m
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    // per-query ADC lookup tables: dot(query subvector, codebook entry)
    val qsubs = q.select(col("query_id"),
      posexplode(transform(sequence(lit(0), lit(m - 1)),
        s => slice(col("qv"), s * subDim + 1, lit(subDim)))).as(Seq("sub", "qsv")))
    val table = qsubs.join(codebook, "sub")
      .withColumn("part", VectorFunctions.vecDotExpr("qsv", "cv"))
      .select("query_id", "sub", "cid", "part")
    val cvecs = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("cn", sqrt(VectorFunctions.vecDotExpr("cv", "cv")))
    // PQ-for-cosine needs each vector's EXACT norm stored beside its
    // codes (one extra double per vector — state is still ~m bytes): ADC
    // approximates the numerator ⟨q,x⟩ only, and ranking unnormalized
    // dots against a cosine target mis-ranks any corpus with varied
    // norms. Candidate score = adc / |x| (query norm is constant per
    // query and cannot reorder).
    val norms = cvecs.select(col("id"), col("cn"))
    // ADC score: sum of m table lookups per (query, vector). Summed in
    // SUB order left-to-right (not a shuffle-order double SUM) so the
    // score — and therefore the candidate SET — is bit-reproducible and
    // a SQL oracle computing p0+p1+…+p7 agrees exactly.
    val approx = codes.join(broadcast(table), Seq("sub", "cid"))
      .filter(col("query_id") =!= col("id"))
      .groupBy("query_id", "id")
      .agg(aggregate(
        transform(array_sort(collect_list(struct(col("sub"), col("part")))),
          x => x.getField("part")),
        lit(0.0), (a, x) => a + x).as("adc"))
      .join(norms, "id")
      .withColumn("crn", row_number().over(
        Window.partitionBy("query_id").orderBy((col("adc") / col("cn")).desc, col("id"))))
      .filter(col("crn") <= candidates)
      .select("query_id", "id")
    // exact re-rank of the bounded candidate set
    val qvecs = q.withColumn("qn", sqrt(VectorFunctions.vecDotExpr("qv", "qv")))
    approx.join(cvecs, "id").join(broadcast(qvecs), "query_id")
      .withColumn("sim",
        VectorFunctions.vecDotExpr("qv", "cv") / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("sim").desc, col("id"))))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("id").as("neighbor_id"), col("sim"))
  }

  /**
   * IVF+PQ — the full FAISS-style composition, each layer attacking a
   * different 100 TB constraint: IVF probe pruning bounds the I/O (only
   * nprobe/k of the corpus is touched), PQ codes bound the MEMORY of the
   * scanned cells (m bytes + one norm per vector), and the exact re-rank
   * of the bounded candidate pool restores accuracy. Deterministic end
   * to end for the same reasons as [[SimSearch.ivfTopK]] and [[pqTopK]],
   * so a SQL oracle replays both chains and the glue.
   */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, topK: Int,
      kIvf: Int = 16, nprobe: Int = 4, m: Int = 8, ks: Int = 16,
      candidates: Int = 30,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    VectorFunctions.register(spark)
    // coarse layer: IVF assignment + probe pick (identical math to ivfTopK)
    val assigned = SimSearch.ivfAssign(corpus, kIvf, idCol, vecCol)
      .select(col("id").as("neighbor_id"), col("v").as("cvec"), col("cluster"))
      .withColumn("cn", sqrt(VectorFunctions.vecDotExpr("cvec", "cvec")))
    val cents = SimSearch.ivfCentroids(assigned)
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val probes = q.join(broadcast(cents), lit(true))
      .withColumn("d2",
        VectorFunctions.vecDotExpr("qv", "qv")
          - lit(2.0) * VectorFunctions.vecDotExpr("qv", "ccv")
          + VectorFunctions.vecDotExpr("ccv", "ccv"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id").orderBy(col("d2"), col("cluster"))))
      .filter(col("rn") <= nprobe)
      .select("query_id", "cluster")
    // fine layer: PQ codes; ADC scan restricted to the probed cells
    val (codes, codebook) = trainEncode(corpus, m, ks, idCol, vecCol)
    val d = corpus.select(size(col(vecCol))).head().getInt(0)
    val subDim = d / m
    val qsubs = q.select(col("query_id"),
      posexplode(transform(sequence(lit(0), lit(m - 1)),
        s => slice(col("qv"), s * subDim + 1, lit(subDim)))).as(Seq("sub", "qsv")))
    val table = qsubs.join(codebook, "sub")
      .withColumn("part", VectorFunctions.vecDotExpr("qsv", "cv"))
      .select("query_id", "sub", "cid", "part")
    val pool = codes
      .join(assigned.select(col("neighbor_id").as("id"), col("cluster"), col("cn")), "id")
      .join(broadcast(probes), "cluster")
      .filter(col("query_id") =!= col("id"))
    val cand = pool.join(broadcast(table), Seq("query_id", "sub", "cid"))
      .groupBy("query_id", "id", "cn")
      .agg(aggregate(
        transform(array_sort(collect_list(struct(col("sub"), col("part")))),
          x => x.getField("part")),
        lit(0.0), (a, x) => a + x).as("adc"))
      .withColumn("crn", row_number().over(
        Window.partitionBy("query_id").orderBy((col("adc") / col("cn")).desc, col("id"))))
      .filter(col("crn") <= candidates)
      .select("query_id", "id")
    // exact re-rank
    val cvecs = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("cn2", sqrt(VectorFunctions.vecDotExpr("cv", "cv")))
    val qvecs = q.withColumn("qn", sqrt(VectorFunctions.vecDotExpr("qv", "qv")))
    cand.join(cvecs, "id").join(broadcast(qvecs), "query_id")
      .withColumn("sim",
        VectorFunctions.vecDotExpr("qv", "cv") / (col("qn") * col("cn2")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("sim").desc, col("id"))))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("id").as("neighbor_id"), col("sim"))
  }

  /** Persist the full IVF+PQ index — the build/search split
    * [[SimSearch.buildIvfIndex]] gives plain IVF, extended with the PQ
    * artifacts: `assigned` (vectors + norms, PARTITIONED BY cluster, for
    * the exact re-rank), `centroids` (kIvf rows), `codebook` (m·ks rows),
    * and `codes` (the m sub-codes per vector, co-PARTITIONED BY cluster so
    * a probe's ADC scan reads only its nprobe cluster directories). At
    * 100 TB the Lloyd + codebook training runs once per corpus version;
    * every query batch pays nprobe/kIvf of the CODE table (m bytes +
    * one norm per vector), never the full vectors. */
  def buildIvfPqIndex(corpus: DataFrame, indexDir: String,
      kIvf: Int = 16, m: Int = 8, ks: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val spark = corpus.sparkSession
    VectorFunctions.register(spark)
    SimSearch.ivfAssign(corpus, kIvf, idCol, vecCol)
      .select(col("id").as("neighbor_id"), col("v").as("cvec"), col("cluster"))
      .withColumn("cn", sqrt(VectorFunctions.vecDotExpr("cvec", "cvec")))
      .write.mode("overwrite").partitionBy("cluster").parquet(s"$indexDir/assigned")
    // read the landed assignment back so centroids + code co-partitioning
    // don't re-run the Lloyd pass
    val assigned = spark.read.parquet(s"$indexDir/assigned")
    SimSearch.ivfCentroids(assigned).coalesce(1)
      .write.mode("overwrite").parquet(s"$indexDir/centroids")
    val (codes, codebook) = trainEncode(corpus, m, ks, idCol, vecCol)
    codebook.coalesce(1).write.mode("overwrite").parquet(s"$indexDir/codebook")
    codes.join(assigned.select(col("neighbor_id").as("id"),
        col("cluster"), col("cn")), "id")
      .write.mode("overwrite").partitionBy("cluster").parquet(s"$indexDir/codes")
  }

  /** Search a [[buildIvfPqIndex]]-persisted index — identical output to
    * [[ivfPqTopK]] over the same corpus and parameters (every persisted
    * artifact is the deterministic product of the same seeded chains),
    * without re-running the Lloyd or codebook builds. */
  def ivfPqTopKIndexed(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, queries: DataFrame, topK: Int,
      nprobe: Int = 4, candidates: Int = 30,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    VectorFunctions.register(spark)
    val assigned = spark.read.parquet(s"$indexDir/assigned")
    val cents = spark.read.parquet(s"$indexDir/centroids")
    val codebook = spark.read.parquet(s"$indexDir/codebook")
    val codes = spark.read.parquet(s"$indexDir/codes")
    // m and subDim recovered from the (m·ks)-row codebook artifact
    val mr = codebook.agg(max(col("sub")), max(size(col("cv")))).head()
    val (m, subDim) = (mr.getInt(0) + 1, mr.getInt(1))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val probes = q.join(broadcast(cents), lit(true))
      .withColumn("d2",
        VectorFunctions.vecDotExpr("qv", "qv")
          - lit(2.0) * VectorFunctions.vecDotExpr("qv", "ccv")
          + VectorFunctions.vecDotExpr("ccv", "ccv"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id").orderBy(col("d2"), col("cluster"))))
      .filter(col("rn") <= nprobe)
      .select("query_id", "cluster")
    val qsubs = q.select(col("query_id"),
      posexplode(transform(sequence(lit(0), lit(m - 1)),
        s => slice(col("qv"), s * subDim + 1, lit(subDim)))).as(Seq("sub", "qsv")))
    val table = qsubs.join(codebook, "sub")
      .withColumn("part", VectorFunctions.vecDotExpr("qsv", "cv"))
      .select("query_id", "sub", "cid", "part")
    // the broadcast probe join lands on the cluster-partitioned code
    // table: dynamic partition pruning limits the ADC scan to the probed
    // cluster directories
    val pool = codes.join(broadcast(probes), "cluster")
      .filter(col("query_id") =!= col("id"))
    val cand = pool.join(broadcast(table), Seq("query_id", "sub", "cid"))
      .groupBy("query_id", "id", "cn")
      .agg(aggregate(
        transform(array_sort(collect_list(struct(col("sub"), col("part")))),
          x => x.getField("part")),
        lit(0.0), (a, x) => a + x).as("adc"))
      .withColumn("crn", row_number().over(
        Window.partitionBy("query_id").orderBy((col("adc") / col("cn")).desc, col("id"))))
      .filter(col("crn") <= candidates)
      .select("query_id", "id")
    // exact re-rank against the index's own vector store
    val cvecs = assigned.select(col("neighbor_id").as("id"),
      col("cvec").as("cv"), col("cn").as("cn2"))
    val qvecs = q.withColumn("qn", sqrt(VectorFunctions.vecDotExpr("qv", "qv")))
    cand.join(cvecs, "id").join(broadcast(qvecs), "query_id")
      .withColumn("sim",
        VectorFunctions.vecDotExpr("qv", "cv") / (col("qn") * col("cn2")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("sim").desc, col("id"))))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("id").as("neighbor_id"), col("sim"))
  }

  /** Build-if-needed with the same staleness proof as
    * [[SimSearch.ensureIvfIndex]]: fingerprint marker written LAST, deleted
    * FIRST on rebuild, so a crash mid-build forces the next run to rebuild.
    * Returns true if the index was (re)built. */
  def ensureIvfPqIndex(corpus: DataFrame, indexDir: String,
      kIvf: Int = 16, m: Int = 8, ks: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding"): Boolean = {
    val spark = corpus.sparkSession
    val fp = SimSearch.corpusFingerprint(corpus, idCol, vecCol)
    val markerPath = new org.apache.hadoop.fs.Path(s"$indexDir/fingerprint")
    val fs = markerPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val want = s"$fp:$kIvf:$m:$ks"
    val fresh = fs.exists(markerPath) && {
      val in = fs.open(markerPath)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
      txt == want
    }
    if (!fresh) {
      if (fs.exists(markerPath) && !fs.delete(markerPath, false))
        throw new java.io.IOException(
          s"cannot invalidate stale IVF+PQ index marker $markerPath")
      Seq("assigned", "centroids", "codebook", "codes").foreach(d =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$indexDir/$d"), true))
      buildIvfPqIndex(corpus, indexDir, kIvf, m, ks, idCol, vecCol)
      val out = fs.create(markerPath, true)
      try out.write(want.getBytes("UTF-8")) finally out.close()
    }
    !fresh
  }
}
