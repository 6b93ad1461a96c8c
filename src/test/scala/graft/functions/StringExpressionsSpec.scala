package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class StringExpressionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.session

  // reference values fetched from DuckDB jaro_winkler_similarity — the
  // oracle this expression must match bit-for-bit at 9dp
  private val reference = Seq(
    ("MARTHA", "MARHTA", 0.9611111111111111),
    ("DWAYNE", "DUANE", 0.8400000000000001),
    ("DIXON", "DICKSONX", 0.8133333333333332),
    ("abc", "abc", 1.0),
    ("", "abc", 0.0),
    ("", "", 0.0),
    ("a", "b", 0.0),
    ("CRATE", "TRACE", 0.7333333333333334), // jaro > 0.7 but prefix 0: no boost
    ("aaaaaaaaaa", "aaaaaaaaab", 0.96), // prefix capped at 4
    ("ab", "az", 0.6666666666666666), // jaro < 0.7: boost suppressed
    ("abcdwxyz", "abcdzzzz", 0.85),
    ("abcdef", "bcaxyz", 0.5555555555555555)) // odd transposition count: integer halving

  test("JaroWinklerAlgo matches DuckDB value-for-value") {
    reference.foreach { case (a, b, want) =>
      val got = JaroWinklerAlgo.compute(a, b)
      assert(math.abs(got - want) < 1e-12, s"($a, $b): got $got want $want")
    }
  }

  test("symmetry and bounds on fixture part names") {
    import spark.implicits._
    val names = spark.read.parquet(s"${SparkTestBase.sf0001}/part.parquet")
      .select("p_name").as[String].collect()
    for (a <- names.take(30); b <- names.take(30)) {
      val ab = JaroWinklerAlgo.compute(a, b)
      assert(ab >= 0.0 && ab <= 1.0)
      assert(ab == JaroWinklerAlgo.compute(b, a))
      if (a == b) assert(ab == 1.0)
    }
  }

  test("expression evaluates through codegen and handles nulls") {
    import spark.implicits._
    StringFunctions.register(spark)
    val df = Seq(("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"), (null, "x"))
      .toDF("a", "b")
    val got = df.select(expr("jaro_winkler(a, b)")).collect()
    assert(math.abs(got(0).getDouble(0) - 0.9611111111111111) < 1e-12)
    assert(math.abs(got(1).getDouble(0) - 0.8133333333333332) < 1e-12)
    assert(got(2).isNullAt(0))
  }
}
