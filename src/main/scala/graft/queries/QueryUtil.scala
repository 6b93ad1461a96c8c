package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType, TimestampNTZType, TimestampType}

/**
 * A named engine query plus (when SQL-expressible) its DuckDB oracle over
 * the same parquet tables. Determinism contract (SURVEY.md §2.3): every
 * query's output ends in a canonical ORDER BY over enough columns to fix
 * the row order, and every aggregate over a money-like double goes through
 * an exact DECIMAL(18,2) sum so Spark and DuckDB hash identically —
 * floating-point sums are order-dependent, decimal sums are not.
 */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryUtil {

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The one shared reader every events query must go through. The
    * documented contract downstream is `ts` = epoch NANOSECONDS as LONG;
    * the fixture's physical type has drifted between TIMESTAMP(NANOS)
    * (readable only as a nanos long under the legacy conf) and
    * TIMESTAMP(MICROS, NTZ), so normalize whatever arrives. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(t(spark, dir, "events"))
  }

  /** Normalize an events frame's `ts` column to epoch-nanos LONG.
    * Session timezone is pinned UTC by every entrypoint, so the
    * NTZ→TIMESTAMP cast is value-preserving. Works on streaming frames
    * too (pure projection). */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType => df
    case TimestampType | TimestampNTZType =>
      df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
    case other =>
      throw new IllegalStateException(s"events.ts has unsupported type $other")
  }

  /** Exact decimal sum of a 2-dp double column, surfaced as double. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** Exact decimal sum for full-precision doubles: round to 6 dp first
    * (same deterministic rounding both engines), then exact sum. */
  def dsum6(c: Column): Column = sum(c.cast(DecimalType(28, 6))).cast(DoubleType)

  /** Deterministic average: exact decimal sum, double division by count —
    * IEEE division is deterministic where a double SUM would not be. */
  def davg(c: Column): Column = (dsum(c) / count(c)).cast(DoubleType)

  /** Per-(fixture-dir, process) scratch path for queries that build
    * on-disk artifacts (indexes, avro round-trips): keyed by a hash of
    * the dir so different fixtures never share state, and by pid so two
    * concurrent bench/test processes never race on a non-atomic
    * rebuild. */
  def scratchDir(dir: String, name: String): String = {
    val key = java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(dir).toLong & 0xffffffffL)
    val pid = java.lang.ProcessHandle.current().pid()
    s"${System.getProperty("java.io.tmpdir")}/graft_${name}_${key}_p$pid"
  }

  /** DuckDB-side equivalents, for composing oracle SQL. */
  def oSum(col: String): String = s"CAST(SUM(CAST($col AS DECIMAL(18,2))) AS DOUBLE)"
  def oSum6(col: String): String = s"CAST(SUM(CAST($col AS DECIMAL(28,6))) AS DOUBLE)"
  def oAvg(col: String): String = s"CAST(${oSum(col)} / COUNT($col) AS DOUBLE)"
}
