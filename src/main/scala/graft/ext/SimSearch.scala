package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.functions.VectorFunctions

/**
 * Similarity search over an embedding column `Array[Float]` (SURVEY.md
 * §2.3 E19). All vector math is higher-order column functions (zip_with +
 * aggregate) in double precision — codegen'd, no UDFs, deterministic
 * left-to-right summation so results hash-match a DuckDB oracle.
 *
 * Scale path: brute-force top-k is exact and fine when the query set is
 * small (it broadcasts); for corpus×corpus work use the LSH variant —
 * random-hyperplane bucketing keeps the join near-linear instead of
 * quadratic in corpus size.
 */
object SimSearch {

  /** Cast a float array column to double for exact, engine-portable math. */
  def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact brute-force cosine top-k: for each query vector, rank the whole
    * corpus. The query side is broadcast — the corpus is scanned once,
    * never shuffled. Ties broken by neighbor id for determinism.
    * Norms are precomputed per row and the pairwise inner loop is the
    * native codegen'd `vec_dot` (graft.functions.VecDot): one tight loop
    * per pair instead of three interpreted array folds. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cvec"))
      .withColumn("cn", sqrt(VectorFunctions.vecDotExpr("cvec", "cvec")))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qvec"))
      .withColumn("qn", sqrt(VectorFunctions.vecDotExpr("qvec", "qvec")))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("sim",
        VectorFunctions.vecDotExpr("qvec", "cvec") / (col("qn") * col("cn")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }

  /** Hard-negative mining for contrastive training: per query vector, the
    * `k` most-similar corpus vectors with a DIFFERENT label (the negatives
    * a contrastive loss learns most from). Same scale contract as
    * [[bruteForceTopK]] — the query batch broadcasts, the corpus is
    * scanned once and never shuffled, the label-mismatch predicate prunes
    * inside the broadcast join before any scoring. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(labelCol).as("__nl"), asDouble(col(vecCol)).as("cvec"))
      .withColumn("cn", sqrt(VectorFunctions.vecDotExpr("cvec", "cvec")))
    val q = queries.select(col(idCol).as("query_id"),
      col(labelCol).as("__ql"), asDouble(col(vecCol)).as("qvec"))
      .withColumn("qn", sqrt(VectorFunctions.vecDotExpr("qvec", "qvec")))
    val scored = c.join(broadcast(q), col("__ql") =!= col("__nl"))
      .withColumn("sim",
        VectorFunctions.vecDotExpr("qvec", "cvec") / (col("qn") * col("cn")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }

  /** Per-label centroid vectors (class prototypes / IVF-training shape),
    * one output row per (label, dimension). The explode+groupBy plan is
    * the scale-correct one: partial hash aggregation collapses every
    * partition to |labels|·dim entries before the shuffle, so shuffle
    * volume is independent of corpus size. Sums go through DECIMAL(28,6)
    * — exact and order-independent, so the means are reproducible across
    * partitionings (and hash-match a SQL oracle). */
  def labelCentroids(corpus: DataFrame, labelCol: String = "label",
      vecCol: String = "embedding"): DataFrame =
    corpus
      .select(col(labelCol), posexplode(col(vecCol)).as(Seq("dim", "x")))
      .groupBy(col(labelCol), col("dim"))
      .agg(count(lit(1)).as("n_vecs"),
        (sum(col("x").cast(DoubleType).cast(DecimalType(28, 6))).cast(DoubleType)
          / count(lit(1))).as("centroid"))

  /** Per-dimension z-score normalization (the standard feature scaler):
    * dimension stats come from exact decimal sums — order-independent, so
    * the scaled values are reproducible and oracle-checkable — and the
    * |dims|-row stats frame broadcasts back onto the exploded corpus, so
    * the only shuffle is the |dims|-group aggregate; the normalize itself
    * is map-side. Output (id, dim, z) rows, z rounded 6 dp. */
  def normalizeDims(corpus: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val e = corpus.select(col(idCol),
      posexplode(asDouble(col(vecCol))).as(Seq("dim", "x")))
    val stats = e.groupBy("dim").agg(
      count(lit(1)).as("n"),
      sum(col("x").cast(DecimalType(28, 6))).cast(DoubleType).as("sx"),
      sum((col("x") * col("x")).cast(DecimalType(28, 6))).cast(DoubleType).as("sxx"))
    val mean = col("sx") / col("n")
    val variance = col("sxx") / col("n") - mean * mean
    // zero-variance guard: a constant dimension scales to z=0, not NULL;
    // and decimal→double rounding can land variance at -1e-18, where
    // Spark's sqrt yields NaN but an oracle engine hard-errors
    val z = when(variance <= 0, lit(0.0))
      .otherwise(round((col("x") - mean) / sqrt(variance), 6))
    e.join(broadcast(stats), "dim")
      .withColumn("z", z)
      .select(col(idCol), col("dim"), col("z"))
  }

  /** All pairs with cosine ≥ threshold (embedding near-dup dedup). Exact;
    * for 100 TB corpora gate it behind `lshBuckets` first. Same
    * precomputed-norm + native-dot shape as `bruteForceTopK`. */
  def nearDupPairs(corpus: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    val base = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", sqrt(VectorFunctions.vecDotExpr("v", "v")))
    val a = base.select(col("id").as("d1"), col("v").as("v1"), col("nrm").as("n1"))
    val b = base.select(col("id").as("d2"), col("v").as("v2"), col("nrm").as("n2"))
    a.join(b, col("d1") < col("d2"))
      .withColumn("sim",
        VectorFunctions.vecDotExpr("v1", "v2") / (col("n1") * col("n2")))
      .filter(col("sim") >= threshold)
      .select("d1", "d2", "sim")
  }

  /** Cross-corpus embedding near-dup: which NEW vectors duplicate one
    * already in the corpus — the embedding twin of
    * `Dedup.jaccardAgainstCorpus` for append-only ingest. The new batch is
    * broadcast (it's the small side by construction); the corpus is
    * scanned once and never shuffled, so per-ingest cost is linear in the
    * corpus with a batch-sized multiplier. */
  def nearDupAgainstCorpus(newVecs: DataFrame, corpus: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    val nb = newVecs.select(col(idCol).as("new_id"), asDouble(col(vecCol)).as("nv"))
      .withColumn("nn", sqrt(VectorFunctions.vecDotExpr("nv", "nv")))
    val cb = corpus.select(col(idCol).as("corpus_id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("cn", sqrt(VectorFunctions.vecDotExpr("cv", "cv")))
    cb.join(broadcast(nb), col("new_id") =!= col("corpus_id"))
      .withColumn("sim",
        VectorFunctions.vecDotExpr("nv", "cv") / (col("nn") * col("cn")))
      .filter(col("sim") >= threshold)
      .select("new_id", "corpus_id", "sim")
  }

  /** Deterministic pseudo-random hyperplanes: plane p, dim d ←
    * md5("seed:p:d") mapped into [-0.5, 0.5). Driver-side tiny matrix,
    * shipped as a literal — no RNG state on executors, stable across
    * cluster sizes. md5 (not engine RNG) so the EXACT same doubles are
    * recomputable in SQL: first 15 hex chars → 60-bit integer, /2⁶⁰
    * (exact power-of-two scaling), −0.5 — every step correctly rounded
    * identically on any IEEE engine, which lets a DuckDB oracle rebuild
    * the planes and hash-match the whole LSH pipeline. */
  private def planes(nPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(nPlanes, dim) { (p, d) =>
      val hex = md.digest(s"$seed:$p:$d".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16).toDouble / 1152921504606846976.0 - 0.5
    }
  }

  /** Random-hyperplane LSH bucket id per vector: bit p = sign(v·plane_p).
    * Vectors in the same bucket are likely cosine-close; search within
    * buckets for the approximate-NN scale path. */
  def withLshBucket(df: DataFrame, nPlanes: Int = 12, dim: Int = 64, seed: Long = 42L,
      vecCol: String = "embedding"): DataFrame = {
    val ps = planes(nPlanes, dim, seed)
    val v = asDouble(col(vecCol))
    val bits = ps.zipWithIndex.map { case (plane, p) =>
      val planeCol = array(plane.map(lit): _*)
      when(dot(v, planeCol) >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    df.withColumn("lsh_bucket", bits.reduce[Column](_.bitwiseOR(_)))
  }

  // ---- IVF (inverted-file) ANN ------------------------------------------

  /**
   * Deterministic IVF index: k centroids from a seeded init (first k rows
   * by a hash-shuffled order) refined by one Lloyd iteration, then every
   * vector assigned to its nearest centroid. All DataFrame ops: centroid
   * recompute is a posexplode + (cluster, dim) mean + rebuild — shuffles
   * scale with corpus size × dim, not corpus². Returns (vec row, cluster).
   */
  def ivfAssign(corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    val base = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    // seeded init: order by a deterministic content hash of the id, take
    // k. md5 (not xxhash64) so a SQL oracle can reproduce the identical
    // pick — the same portability switch as the LSH planes.
    val init = base.orderBy(md5(col("id").cast("string")), col("id")).limit(k)
      .select(col("id"), col("v").as("cv"))
      .withColumn("cid",
        row_number().over(Window.orderBy(md5(col("id").cast("string")), col("id"))) - 1)
      .select("cid", "cv")

    def nearest(points: DataFrame, centroids: DataFrame): DataFrame = {
      // squared L2 via dots: |p|^2 - 2 p·c + |c|^2; rank over broadcast centroids
      val scored = points.join(broadcast(centroids), lit(true))
        .withColumn("d2",
          VectorFunctions.vecDotExpr("v", "v")
            - lit(2.0) * VectorFunctions.vecDotExpr("v", "cv")
            + VectorFunctions.vecDotExpr("cv", "cv"))
      scored.withColumn("rn", row_number().over(
          Window.partitionBy("id").orderBy(col("d2"), col("cid"))))
        .filter(col("rn") === 1).drop("rn", "d2", "cv")
    }

    // one Lloyd refinement: element-wise mean per cluster, distributed by
    // (cluster, dimension) so no single reducer holds a whole cluster.
    // The mean is an exact decimal sum ÷ count (a double AVG is
    // order-dependent across partitionings/engines; the decimal sum is
    // not), so centroid doubles are bit-identical everywhere.
    val assigned0 = nearest(base, init)
    val means = assigned0
      .select(col("cid"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy("cid", "dim")
      .agg((sum(col("x").cast(DecimalType(28, 12))).cast(DoubleType)
        / count(lit(1))).as("m"))
      .groupBy("cid").agg(
        transform(array_sort(collect_list(struct(col("dim"), col("m")))),
          s => s.getField("m")).as("cv"))
    nearest(base, means).withColumnRenamed("cid", "cluster")
  }

  /** IVF approximate top-k: search only the `nprobe` clusters nearest to
    * each query. Cost per query ≈ nprobe/k of the corpus — the inverted-
    * file layout that makes ANN tractable at 100 TB, with recall
    * controlled by nprobe. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, topK: Int,
      k: Int = 16, nprobe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    val assigned = graft.ops.BoundedCache.cached(
      ivfAssign(corpus, k, idCol, vecCol)
        .select(col("id").as("neighbor_id"), col("v").as("cvec"), col("cluster"))
        .withColumn("cn", sqrt(VectorFunctions.vecDotExpr("cvec", "cvec"))))
    ivfSearch(assigned, ivfCentroids(assigned), queries, topK, nprobe, idCol, vecCol)
  }

  /** Probe centroids recomputed from an assignment (exact decimal mean,
    * the same portability contract as ivfAssign). */
  private[ext] def ivfCentroids(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cluster"), posexplode(col("cvec")).as(Seq("dim", "x")))
      .groupBy("cluster", "dim")
      .agg((sum(col("x").cast(DecimalType(28, 12))).cast(DoubleType)
        / count(lit(1))).as("m"))
      .groupBy("cluster").agg(
        transform(array_sort(collect_list(struct(col("dim"), col("m")))),
          s => s.getField("m")).as("ccv"))

  /** The search phase over a (built or loaded) index: nprobe cluster
    * picks per query against the broadcast centroid table, then one
    * cluster-key join into the assignment. */
  private def ivfSearch(assigned: DataFrame, centroids: DataFrame,
      queries: DataFrame, topK: Int, nprobe: Int,
      idCol: String, vecCol: String): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qvec"))
      .withColumn("qn", sqrt(VectorFunctions.vecDotExpr("qvec", "qvec")))
    // pick nprobe closest clusters per query
    val probes = q.join(broadcast(centroids), lit(true))
      .withColumn("d2",
        VectorFunctions.vecDotExpr("qvec", "qvec")
          - lit(2.0) * VectorFunctions.vecDotExpr("qvec", "ccv")
          + VectorFunctions.vecDotExpr("ccv", "ccv"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id").orderBy(col("d2"), col("cluster"))))
      .filter(col("rn") <= nprobe)
      .select("query_id", "qvec", "qn", "cluster")
    assigned.join(broadcast(probes), Seq("cluster"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim",
        VectorFunctions.vecDotExpr("qvec", "cvec") / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))))
      .filter(col("rank") <= topK)
      .select("query_id", "rank", "neighbor_id", "sim")
  }

  /** Persist the IVF index: the assignment lands as parquet PARTITIONED
    * BY cluster — a probe then reads only its nprobe cluster directories
    * (dynamic partition pruning fires on the broadcast cluster join) —
    * plus the k-row probe-centroid table. This is the build/search split
    * the 100 TB design needs: the O(corpus) Lloyd pass runs ONCE per
    * corpus version and every later query batch pays only
    * nprobe/k-of-corpus scan + a KB-sized centroid read. */
  def buildIvfIndex(corpus: DataFrame, indexDir: String, k: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    VectorFunctions.register(corpus.sparkSession)
    val assigned = ivfAssign(corpus, k, idCol, vecCol)
      .select(col("id").as("neighbor_id"), col("v").as("cvec"), col("cluster"))
      .withColumn("cn", sqrt(VectorFunctions.vecDotExpr("cvec", "cvec")))
    assigned.write.mode("overwrite")
      .partitionBy("cluster").parquet(s"$indexDir/assigned")
    ivfCentroids(assigned).coalesce(1)
      .write.mode("overwrite").parquet(s"$indexDir/centroids")
  }

  /** Search a [[buildIvfIndex]]-persisted index — identical output to
    * [[ivfTopK]] over the same corpus (the index IS the deterministic
    * assignment), without re-running the build. */
  def ivfTopKIndexed(spark: SparkSession, indexDir: String,
      queries: DataFrame, topK: Int, nprobe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    VectorFunctions.register(spark)
    val assigned = spark.read.parquet(s"$indexDir/assigned")
    val centroids = spark.read.parquet(s"$indexDir/centroids")
    ivfSearch(assigned, centroids, queries, topK, nprobe, idCol, vecCol)
  }

  /** Order-independent corpus fingerprint: exact-decimal sum of per-row
    * xxhash64 over (id, vector) — one map-side-combined aggregate, no
    * shuffle beyond the final scalar, overflow-free under ANSI mode. Any
    * changed/added/dropped row moves the sum. */
  def corpusFingerprint(corpus: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): String =
    String.valueOf(corpus.select(
      sum(xxhash64(col(idCol), col(vecCol).cast("string"))
        .cast(DecimalType(38, 0)))).head().get(0))

  /** Build-if-needed with STALENESS PROOF: the index directory carries the
    * fingerprint of the corpus it was built from, and a mismatch forces a
    * rebuild — a persisted index silently serving assignments from an old
    * corpus version is the failure mode that corrupts every downstream
    * search. The check costs one scan of the corpus (far cheaper than the
    * Lloyd build it guards); callers that version their corpus externally
    * (e.g. a [[graft.io.Manifest]] snapshot id per build) can key the
    * index dir by snapshot instead and skip the scan. Returns true if the
    * index was (re)built. */
  def ensureIvfIndex(corpus: DataFrame, indexDir: String, k: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding"): Boolean = {
    val spark = corpus.sparkSession
    val fp = corpusFingerprint(corpus, idCol, vecCol)
    // Hadoop FS, not java.io: the index dir may be on an object store —
    // the staleness guard must live on the same filesystem as the index.
    val markerPath = new org.apache.hadoop.fs.Path(s"$indexDir/fingerprint")
    val fs = markerPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val want = s"$fp:$k"
    val fresh = fs.exists(markerPath) && {
      val in = fs.open(markerPath)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
      txt == want
    }
    if (!fresh) {
      // Invalidate-then-rebuild ordering: drop the marker (and any stale
      // index data) BEFORE the build, write the marker only AFTER it
      // succeeds. A crash mid-build then leaves NO marker — the next run
      // rebuilds — instead of an old marker pointing at new half-written
      // data (the silent-staleness failure this function exists to stop).
      if (fs.exists(markerPath) && !fs.delete(markerPath, false))
        throw new java.io.IOException(
          s"cannot invalidate stale IVF index marker $markerPath — refusing to " +
            "rebuild over a marker that would mis-certify the result")
      fs.delete(new org.apache.hadoop.fs.Path(s"$indexDir/assigned"), true)
      fs.delete(new org.apache.hadoop.fs.Path(s"$indexDir/centroids"), true)
      buildIvfIndex(corpus, indexDir, k, idCol, vecCol)
      val out = fs.create(markerPath, true)
      try out.write(want.getBytes("UTF-8")) finally out.close()
    }
    !fresh
  }

  /** Incremental index maintenance: assign a NEW batch to the index's
    * persisted centroids (no recluster — classic IVF append; centroid
    * drift is accepted until the next full rebuild) and append the coded
    * rows into the cluster-partitioned assignment. At 100 TB this is the
    * difference between a daily O(batch) ingest and a daily O(corpus)
    * Lloyd pass. Freshness is TWO markers: the base `fingerprint` (from
    * [[ensureIvfIndex]]'s contract) plus an `append_fingerprint` for the
    * batch — both must match or the whole index is rebuilt from base and
    * re-appended, because a half-applied append over parquet `append`
    * mode cannot be rolled back file-by-file. The markers stay CHEAP
    * because [[corpusFingerprint]] is an additive decimal sum — no
    * combined-corpus scan is ever needed. Returns true if any build or
    * append work ran. */
  def ensureIvfIndexAppended(base: DataFrame, newBatch: DataFrame,
      indexDir: String, k: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding"): Boolean = {
    val spark = base.sparkSession
    VectorFunctions.register(spark)
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def readMarker(p: org.apache.hadoop.fs.Path): Option[String] =
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim)
        finally in.close()
      }
    val baseMarker = new org.apache.hadoop.fs.Path(s"$indexDir/fingerprint")
    val appMarker = new org.apache.hadoop.fs.Path(s"$indexDir/append_fingerprint")
    // the base marker carries an "append-base:" prefix so a later plain
    // ensureIvfIndex(base, dir) can NEVER see this appended index as a
    // fresh pure-base index (it holds base ∪ batch) — it will rebuild
    val wantBase = s"append-base:${corpusFingerprint(base, idCol, vecCol)}:$k"
    val wantApp = s"${corpusFingerprint(newBatch, idCol, vecCol)}:$k"
    if (readMarker(baseMarker).contains(wantBase)
        && readMarker(appMarker).contains(wantApp)) return false
    // invalidate-then-rebuild, same ordering contract as ensureIvfIndex:
    // a marker that survives the invalidate would mis-certify the result
    Seq(baseMarker, appMarker).foreach { p =>
      if (fs.exists(p) && !fs.delete(p, false))
        throw new java.io.IOException(
          s"cannot invalidate stale IVF index marker $p — refusing to " +
            "rebuild over a marker that would mis-certify the result")
    }
    fs.delete(new org.apache.hadoop.fs.Path(s"$indexDir/assigned"), true)
    fs.delete(new org.apache.hadoop.fs.Path(s"$indexDir/centroids"), true)
    buildIvfIndex(base, indexDir, k, idCol, vecCol)
    val centroids = spark.read.parquet(s"$indexDir/centroids")
    val nb = newBatch.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cvec"))
      .withColumn("cn", sqrt(VectorFunctions.vecDotExpr("cvec", "cvec")))
    val assignedNew = nb.join(broadcast(centroids), lit(true))
      .withColumn("d2",
        VectorFunctions.vecDotExpr("cvec", "cvec")
          - lit(2.0) * VectorFunctions.vecDotExpr("cvec", "ccv")
          + VectorFunctions.vecDotExpr("ccv", "ccv"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("neighbor_id").orderBy(col("d2"), col("cluster"))))
      .filter(col("rn") === 1)
      .select("neighbor_id", "cvec", "cn", "cluster")
    assignedNew.write.mode("append")
      .partitionBy("cluster").parquet(s"$indexDir/assigned")
    Seq((baseMarker, wantBase), (appMarker, wantApp)).foreach { case (p, v) =>
      val out = fs.create(p, true)
      try out.write(v.getBytes("UTF-8")) finally out.close()
    }
    true
  }

  /** Approximate top-k: candidates drawn only from the query's LSH bucket
    * (and the corpus is pre-bucketed once). Recall < 1 by construction;
    * this is the plan shape that survives a 1000-executor scale-up. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nPlanes: Int = 12, dim: Int = 64, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    val c = withLshBucket(corpus, nPlanes, dim, seed, vecCol)
      .select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cvec"), col("lsh_bucket"))
      .withColumn("cn", sqrt(VectorFunctions.vecDotExpr("cvec", "cvec")))
    val q = withLshBucket(queries, nPlanes, dim, seed, vecCol)
      .select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qvec"), col("lsh_bucket"))
      .withColumn("qn", sqrt(VectorFunctions.vecDotExpr("qvec", "qvec")))
    c.join(broadcast(q), Seq("lsh_bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim",
        VectorFunctions.vecDotExpr("qvec", "cvec") / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }
}
