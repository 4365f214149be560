package graft

import graft.html.Web
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** URL/domain curation operators: parse, per-domain quality profile,
  * blocklist derivation + anti-join, outlink harvest.
  */
class WebSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-web-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def one(c: org.apache.spark.sql.Column, u: String): String = {
    import spark.implicits._
    Seq(u).toDF("u").select(c.as("v")).as[String].head()
  }

  test("urlHost / urlPath / registeredDomain parse the usual shapes") {
    assert(one(Web.urlHost(col("u")), "https://cdn.news.example.com/en/7?x=1") ==
      "cdn.news.example.com")
    assert(one(Web.urlPath(col("u")), "https://a.com/en/7?x=1#f") == "/en/7")
    assert(one(Web.urlPath(col("u")), "https://a.com") == "")
    assert(one(Web.registeredDomain(Web.urlHost(col("u"))),
      "https://cdn.news.example.com/x") == "example.com")
    assert(one(Web.registeredDomain(Web.urlHost(col("u"))),
      "https://example.com/x") == "example.com")
    // no scheme -> empty host -> empty domain, never a crash
    assert(one(Web.urlHost(col("u")), "not a url") == "")
    assert(one(Web.registeredDomain(Web.urlHost(col("u"))), "not a url") == "")
  }

  test("outlinks returns href targets in document order") {
    import spark.implicits._
    val html = "<a href=\"/doc/1\">a</a><p>x</p><a href=\"/about\">b</a>" +
      "<a href=\"https://e.com/z\">c</a>"
    val got = Seq(html).toDF("h")
      .select(Web.outlinks(col("h")).as("l")).as[Seq[String]].head()
    assert(got == Seq("/doc/1", "/about", "https://e.com/z"))
  }

  private def corpus(): DataFrame = {
    import spark.implicits._
    // good.com: long prose with stopwords; bad.com: short junk
    val prose = "the quick brown fox and the lazy dog were of a mind " * 8
    Seq(
      (1L, "https://good.com/a", prose),
      (2L, "https://www.good.com/b", prose),
      (3L, "https://bad.com/a", "zz"),
      (4L, "https://bad.com/b", "qq")
    ).toDF("doc_id", "url", "text")
  }

  test("domainStats folds subdomains and sums integer micro-quality") {
    val st = corpus().transform(Web.domainStats(_, "url", "text"))
      .orderBy("domain").collect()
    assert(st.map(_.getString(0)).toSeq == Seq("bad.com", "good.com"))
    val good = st(1)
    assert(good.getLong(1) == 2L) // www. folded into good.com
    assert(good.getLong(2) > 0L)
    assert(st(0).getLong(2) < good.getLong(2))
  }

  test("lowQualityDomains cuts below-global-mean domains; filter drops their docs") {
    val docs = corpus()
    val blocked = Web.lowQualityDomains(Web.domainStats(docs, "url", "text"))
    assert(blocked.collect().map(_.getString(0)).toSeq == Seq("bad.com"))
    val kept = Web.filterBlockedDomains(docs, "url", blocked)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 2L))
  }

  test("blocklist application is a broadcast anti-join (no shuffle of the corpus)") {
    val docs = corpus()
    val blocked = Web.lowQualityDomains(Web.domainStats(docs, "url", "text"))
    val plan = Web.filterBlockedDomains(docs, "url", blocked)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast anti-join, got:\n$plan")
  }
}
