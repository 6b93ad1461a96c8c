package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class UrlOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.session
  import spark.implicits._

  private def norm(urls: String*): Seq[String] =
    urls.toDF("url").select(UrlOps.normalizeUrl(col("url"))).as[String].collect().toSeq

  test("normalization rules, one by one and composed") {
    assert(norm(
      // fragment + scheme/host case + www + default port + utm in the middle
      "HTTPS://WWW.Example.COM:443/A/b?x=1&utm_source=rss&y=2#frag",
      // leading utm with a kept param after it: separator repaired
      "http://example.com/p?utm_campaign=c&x=1",
      // only utm params: query gone entirely
      "http://example.com/p?utm_a=1&utm_b=2",
      // non-default port and path case are PRESERVED
      "https://Example.com:8080/CaseSensitive/Path/",
      // www only stripped as a leading label
      "https://notwww.example.com/q",
      // bare root with trailing slash
      "https://example.org/"
    ) == Seq(
      "https://example.com/A/b?x=1&y=2",
      "http://example.com/p?x=1",
      "http://example.com/p",
      "https://example.com:8080/CaseSensitive/Path",
      "https://notwww.example.com/q",
      "https://example.org"))
  }

  test("near-duplicate URL variants collapse to one canonical form") {
    val variants = Seq(
      "https://www.example.com/article?utm_source=a",
      "HTTPS://example.com:443/article",
      "https://example.com/article#top",
      "https://example.com/article")
    assert(norm(variants: _*).distinct == Seq("https://example.com/article"))
  }

  test("host and registered domain extraction") {
    val rows = Seq(
      "https://a.b.example.co.uk/x",
      "https://example.com:8080/x",
      "https://deep.sub.tree.example.net/x")
      .toDF("url")
      .select(UrlOps.hostOf(UrlOps.normalizeUrl(col("url"))).as("host"))
      .withColumn("dom",
        UrlOps.registeredDomainOf(col("host"), Seq("co.uk", "ac.uk")))
      .as[(String, String)].collect().toSeq
    assert(rows == Seq(
      ("a.b.example.co.uk", "example.co.uk"),
      ("example.com", "example.com"),
      ("deep.sub.tree.example.net", "example.net")))
  }

  test("the whole chain is codegen'd expressions — no UDF in the plan") {
    val df = Seq("https://www.example.com/a?utm_x=1").toDF("url")
      .select(UrlOps.registeredDomainOf(
        UrlOps.hostOf(UrlOps.normalizeUrl(col("url"))), Seq("co.uk")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }
}
