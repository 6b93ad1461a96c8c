package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession across all suites (forked test JVM). */
object SparkTestBase {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // INT96 (the 4.x default) is deprecated AND carries no usable footer
      // stats - micros keeps timestamp columns data-skippable
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // production entry points (Verify/Bench) install the engine's
      // optimizer extensions; tests run against the same session shape
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf0001 = "/root/testdata/sf0.001"
}
