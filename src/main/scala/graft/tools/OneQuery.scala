package graft.tools

import org.apache.spark.sql.SparkSession

/** Run one named SparkEntry query against a fixture dir and print its
  * row count + first rows — scratch harness for iterating on a single
  * operator without a full Verify pass. */
object OneQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    println(s"ROWS ${df.count()}")
    df.show(10, truncate = false)
    spark.stop()
  }
}
