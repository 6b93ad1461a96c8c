package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** Scratch profiler for operator stage timing (not part of the API). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $label ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    time("shingles.count")(Dedup.shingles(docs, "doc_id", "text", 3).count())
    val sh = Dedup.shingles(docs, "doc_id", "text", 3)
      .select(col("doc_id"), xxhash64(col("shingle")).as("shash"))
    time("shingles_hashed.count")(sh.count())
    val a = sh.select(col("doc_id").as("d1"), col("shash"))
    val b = sh.select(col("doc_id").as("d2"), col("shash"))
    val inter = a.join(b, a("shash") === b("shash") && a("d1") < b("d2"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("i"))
    time("inter.count")(inter.count())
    time("jaccard_full_nocache") {
      Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8).count()
    }
    time("jaccard_full_again") {
      Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8).count()
    }
    time("minhash_sigs")(Dedup.minhashSignatures(docs, "doc_id", "text").count())
    time("minhash_full")(Dedup.minhashNearDupPairs(docs, "doc_id", "text").count())
    spark.stop()
  }
}
