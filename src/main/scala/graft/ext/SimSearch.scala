package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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

  /** Deterministic pseudo-random hyperplanes: plane p, dim d ← a fixed
    * affine hash mapped into [-0.5, 0.5). Driver-side tiny matrix, shipped
    * as a literal — no RNG state on executors, stable across cluster sizes. */
  private def planes(nPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)(rnd.nextDouble() - 0.5)
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
