package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, SimSearch}

/** Scratch profiler for operator stage timing (not part of the API). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    emb.count(); docs.count()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $label ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val q = emb.filter(col("vec_id") < 10)
    // warm
    time("warm_brute")(SimSearch.bruteForceTopK(emb, q, 5).count())
    time("brute")(SimSearch.bruteForceTopK(emb, q, 5).count())
    time("lsh_bucket_only")(SimSearch.withLshBucket(emb).count())
    time("lsh_full")(SimSearch.lshTopK(emb, q, 5).count())
    time("lsh_full_again")(SimSearch.lshTopK(emb, q, 5).count())
    time("ivf_assign")(SimSearch.ivfAssign(emb, 16).count())
    time("ivf_full")(SimSearch.ivfTopK(emb, q, 5, 16, 4).count())
    time("ivf_full_again")(SimSearch.ivfTopK(emb, q, 5, 16, 4).count())
    time("jaccard_nocache")(Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8).count())
    // variant: reuse the shingle frame via cache vs lazy localCheckpoint
    def jaccardWith(sh0: org.apache.spark.sql.DataFrame): Long = {
      val sizes = sh0.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val a = sh0.select(col("doc_id").as("d1"), col("shash"))
      val b = sh0.select(col("doc_id").as("d2"), col("shash"))
      val inter = a.join(b, a("shash") === b("shash") && a("d1") < b("d2"))
        .groupBy("d1", "d2").agg(count(lit(1)).as("i"))
      inter
        .join(sizes.select(col("doc_id").as("d1"), col("sz").as("sz1")), "d1")
        .join(sizes.select(col("doc_id").as("d2"), col("sz").as("sz2")), "d2")
        .withColumn("jaccard", col("i").cast("double") / (col("sz1") + col("sz2") - col("i")))
        .filter(col("jaccard") >= 0.8).count()
    }
    val shBase = Dedup.hashedShingles(docs, "doc_id", "text", 3)
    val shCached = shBase.cache()
    time("jaccard_cache")(jaccardWith(shCached))
    shCached.unpersist()
    time("jaccard_localckpt")(jaccardWith(shBase.localCheckpoint(false)))
    time("jaccard_localckpt2")(jaccardWith(shBase.localCheckpoint(false)))
    time("minhash_nocache")(Dedup.minhashNearDupPairs(docs, "doc_id", "text").count())
    time("simhash")(Dedup.simhashNearDupPairs(docs, "doc_id", "text").count())
    spark.stop()
  }
}
