package graft

import graft.dedup.LineDedup
import graft.html.Web
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Line-level boilerplate removal + URL canonicalization/dedup. */
class LineDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-linededup-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "t")
  }

  test("lineStats counts distinct docs per normalized line, once per doc") {
    val df = docs(
      (1L, "Header\nbody one\nheader"), // Header repeats in-doc: counts once
      (2L, "HEADER \nbody two"),        // case+trim folds into the same key
      (3L, "unrelated"))
    val st = LineDedup.lineStats(df, "doc_id", "t")
    import spark.implicits._
    val rows = st.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val headerHash = Seq("header").toDF("k")
      .select(graft.PortableHash.md5Hash60(col("k"))).as[Long].head()
    assert(rows(headerHash) == 2L)
    assert(rows.values.toSeq.sorted == Seq(1L, 1L, 1L, 2L))
  }

  test("stripDuplicatedLines drops frequent lines, keeps order, keeps empty docs") {
    val boiler = "nav | nav"
    val df = docs(
      (1L, s"$boiler\nkeep a\nkeep b"),
      (2L, s"$boiler\nkeep c"),
      (3L, s"$boiler\nKEEP d\n$boiler"),
      (4L, boiler)) // all-boilerplate doc survives with empty text
    val out = LineDedup.stripDuplicatedLines(df, "doc_id", "t", maxDocs = 2)
      .orderBy("doc_id").collect()
    assert(out.map(_.getString(1)).toSeq ==
      Seq("keep a\nkeep b", "keep c", "KEEP d", ""))
    assert(out.map(_.getLong(2)).toSeq == Seq(2L, 1L, 1L, 0L))
  }

  test("blank lines are neither counted nor kept") {
    val df = docs((1L, "a\n\n \nb"), (2L, "a\nz"), (3L, "a\ny"))
    val out = LineDedup.stripDuplicatedLines(df, "doc_id", "t", maxDocs = 2)
      .orderBy("doc_id").collect()
    // "a" is in 3 docs > 2 -> dropped; blanks dropped; b/z/y kept
    assert(out.map(_.getString(1)).toSeq == Seq("b", "z", "y"))
  }

  test("filterLines keeps terminal-punctuation lines in order") {
    val df = docs(
      (1L, "Nav | Bar\nA sentence.\nbare tokens\n\"quoted\"\nend!"),
      (2L, "no punct at all\nstill none")) // all filtered -> empty doc
    val out = LineDedup.filterLines(df, "doc_id", "t",
        LineDedup.terminalPunctuation)
      .orderBy("doc_id").collect()
    assert(out.map(_.getString(1)).toSeq ==
      Seq("A sentence.\n\"quoted\"\nend!", ""))
    assert(out.map(_.getLong(2)).toSeq == Seq(3L, 0L))
  }

  test("canonicalUrl normalizes scheme/host/port/path/query/fragment") {
    import spark.implicits._
    def canon(u: String): String =
      Seq(u).toDF("u").select(Web.canonicalUrl(col("u")).as("c")).as[String].head()
    assert(canon("https://www.Site0.com:443/page/3/?utm_source=feed&q=1#top") ==
      "https://site0.com/page/3?q=1")
    assert(canon("HTTPS://SITE0.COM/page/3?q=1&gclid=abc") ==
      "https://site0.com/page/3?q=1")
    assert(canon("https://site0.com:80/page/3//?q=1") ==
      "https://site0.com/page/3?q=1")
    assert(canon("https://site0.com/page/3?q=1") ==
      "https://site0.com/page/3?q=1")
    // tracking-only query drops the '?' entirely; bare host stays bare
    assert(canon("http://a.com/x?utm_medium=z") == "http://a.com/x")
    assert(canon("http://a.com") == "http://a.com")
    // non-URLs pass through untouched
    assert(canon("not a url") == "not a url")
  }

  test("anchorLinks parses (href, anchor) pairs; anchorProfile aggregates") {
    import spark.implicits._
    val html = "<a href=\"/doc/1\">home</a><p>x</p>" +
      "<a href=\"/doc/2\">ref</a><a href=\"/doc/1\">home</a>"
    val pairs = Seq(html).toDF("h")
      .select(explode(Web.anchorLinks(col("h"))).as("l"))
      .select("l.href", "l.anchor").as[(String, String)].collect().toSeq
    assert(pairs ==
      Seq(("/doc/1", "home"), ("/doc/2", "ref"), ("/doc/1", "home")))
    val links = Seq(
      (10L, 1L, "home"), (11L, 1L, "home"), (11L, 1L, "docs"),
      (12L, 2L, "ref"), (13L, 2L, "abc")) // dst 2: count tie -> "abc"
      .toDF("src", "dst", "anchor")
    val prof = Web.anchorProfile(links, "dst", "anchor", "src")
      .orderBy("dst").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    assert(prof == Seq((1L, 3L, 2L, "home"), (2L, 2L, 2L, "abc")))
  }

  test("dedupLinesWithinDoc keeps first occurrence, folds case/trim, drops blanks") {
    val df = docs(
      (1L, "Chorus\nbody one\nchorus \n\nbody one\nunique"),
      (2L, "only line"),
      (3L, "\n\n"), // all-blank doc survives with empty text
      (4L, "a\nA\na "))
    val got = LineDedup.dedupLinesWithinDoc(df, "doc_id", "t")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got(1L) == (("Chorus\nbody one\nunique", 3L)))
    assert(got(2L) == (("only line", 1L)))
    assert(got(3L) == (("", 0L)))
    assert(got(4L) == (("a", 1L)))
    // record-local: no exchange anywhere in the plan
    val plan = LineDedup.dedupLinesWithinDoc(df, "doc_id", "t")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free plan:\n$plan")
  }

  test("dedupByUrl keeps the min-id row per canonical URL in one aggregation") {
    import spark.implicits._
    val df = Seq(
      (10L, "https://www.a.com/p/?utm_source=x"),
      (11L, "HTTP://A.COM/p"),      // different scheme -> distinct
      (12L, "https://a.com:443/p"), // collides with 10
      (13L, "https://b.com/p")
    ).toDF("doc_id", "url")
    val out = Web.dedupByUrl(df, "url", "doc_id")
    val kept = out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(10L, 11L, 13L))
    // exactly one shuffle: a single HashAggregate pair, no join
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"expected join-free plan, got:\n$plan")
  }

  test("sentence strip: boilerplate sentences cut, order kept, all-boilerplate survives empty") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Accept cookies. Real insight one! More real text. Share this."),
      (2L, "Accept cookies. Different real content? Share this."),
      (3L, "Accept cookies. Share this."), // nothing unique -> empty survivor
      (4L, "accept COOKIES. Standalone thought.")) // case-folded key still hits
      .toDF("doc_id", "text")
    val got = graft.dedup.SentenceDedup
      .stripFrequentSentences(docs, "doc_id", "text", maxDocs = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // "Accept cookies." appears in 4 docs (case-insensitive), "Share
    // this." in 3 -> both over maxDocs=2; everything else unique
    assert(got(1L) == (("Real insight one! More real text.", 2L)))
    assert(got(2L) == (("Different real content?", 1L)))
    assert(got(3L) == (("", 0L)))
    assert(got(4L) == (("Standalone thought.", 1L)))
  }
}
