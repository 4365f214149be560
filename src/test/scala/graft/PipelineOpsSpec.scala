package graft

import graft.corpus.{Dsir, Interleave}
import graft.dedup.Boilerplate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-4g pipeline operators: DSIR importance weights, caption
  * association, header/footer template strip.
  */
class PipelineOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-pipelineops-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // ---- DSIR -----------------------------------------------------------

  test("dsir ranks target-like docs above off-target docs") {
    import spark.implicits._
    // target vocabulary {aa bb cc}, off-target {zz yy xx}
    val docs = (
      (0 until 20).map(i => (i.toLong, true, "aa bb cc aa bb")) ++
      (20 until 40).map(i => (i.toLong, false, "zz yy xx zz yy")) ++
      Seq((100L, false, "aa bb aa bb cc"),  // raw doc that LOOKS target
          (101L, false, "zz yy zz yy xx"))  // raw doc that doesn't
    ).toDF("doc_id", "tgt", "text")
    val w = Dsir.score(docs, "doc_id", "text", col("tgt"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w(100L) > w(101L))
    // a target doc itself scores high (same text as 100)
    assert(w(0L) == w(100L))
    // weights are exact integers, deterministic across runs
    val w2 = Dsir.score(docs, "doc_id", "text", col("tgt"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w == w2)
  }

  test("dsir selectTop takes exactly n with (weight desc, id) tiebreak") {
    import spark.implicits._
    val docs = (0 until 30).map(i =>
      (i.toLong, i < 10, if (i < 10 || i >= 20) "aa bb" else "zz yy"))
      .toDF("doc_id", "tgt", "text")
    val top = Dsir.selectTop(docs, "doc_id", "text", col("tgt"), n = 15)
      .collect().map(_.getLong(0)).toSet
    assert(top.size == 15)
    // the 20 "aa bb" docs (ids 0..9 and 20..29) outrank the 10 "zz yy"
    // docs; ties break by id asc
    assert(top == ((0L until 10L) ++ (20L until 25L)).toSet)
  }

  // ---- caption association -------------------------------------------

  private def spansDf(rows: Seq[(String, Int, String, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "offset", "kind", "text", "media_ref")
  }

  test("captionAssoc prefers following text, falls back to preceding") {
    val sp = spansDf(Seq(
      ("d1", 0, "text", "intro", ""),
      ("d1", 1, "media", "", "m1"),     // next text at 2
      ("d1", 2, "text", "caption one", ""),
      ("d1", 3, "media", "", "m2"),     // no following text -> prev at 2
      ("d2", 0, "media", "", "m3"),     // doc with no text at all
      ("d2", 1, "media", "", "m4")))
    val out = Interleave.captionAssoc(sp, "doc_id", "offset", "kind", "text", "media_ref")
      .collect().map(r => (r.getString(2), (r.getString(5),
        Option(r.get(3)).map(_.toString).orNull, r.getString(4)))).toMap
    assert(out("m1") == (("next", "2", "caption one")))
    assert(out("m2") == (("prev", "2", "caption one")))
    assert(out("m3") == (("none", null, null)))
    assert(out("m4") == (("none", null, null)))
  }

  test("captionAssoc emits one row per media span, none for text") {
    val sp = spansDf(Seq(
      ("d1", 0, "text", "a", ""),
      ("d1", 1, "media", "", "m1"),
      ("d1", 2, "word_box", "w", "0,1,0,1"),
      ("d1", 3, "media", "", "m2")))
    val out = Interleave.captionAssoc(sp, "doc_id", "offset", "kind", "text", "media_ref")
    assert(out.count() == 2)
    // word_box spans are neither captions nor media: m2's caption is
    // still the text at 0 (prev), not the word_box at 2
    val m2 = out.filter(col("media_ref") === "m2").collect()(0)
    assert(m2.getString(5) == "prev" && m2.getInt(3) == 0)
  }

  // ---- header/footer strip -------------------------------------------

  private def siteDocs(): DataFrame = {
    import spark.implicits._
    // site A: 8 of 10 docs carry banner+footer; site B: none do
    val a = (0 until 10).map { i =>
      val body = s"body a$i unique"
      val t = if (i < 8) s"SiteA Banner\n$body\n(c) SiteA" else body
      (i.toLong, "a", t)
    }
    val b = (10 until 20).map(i => (i.toLong, "b", s"body b$i unique"))
    (a ++ b).toDF("doc_id", "source", "t")
  }

  test("headerFooterStrip cuts per-source edge templates only") {
    val out = Boilerplate.headerFooterStrip(siteDocs(), "doc_id", "source", "t")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    (0 until 8).foreach { i =>
      assert(out(i.toLong) == ((s"body a$i unique", 2L)), s"doc $i")
    }
    (8 until 20).foreach { i =>
      assert(out(i.toLong)._2 == 0L, s"doc $i dropped lines")
    }
  }

  test("templateAudit reports the detected (source, side) templates") {
    val audit = Boilerplate.templateAudit(siteDocs(), "doc_id", "source", "t")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(audit.toSet == Set(
      ("a", "sitea banner", "header", 8L),
      ("a", "(c) sitea", "footer", 8L)))
  }

  test("headerFooterStrip below-threshold template survives") {
    import spark.implicits._
    // only 2 of 10 docs share the banner: under 3/10
    val docs = (0 until 10).map { i =>
      val t = if (i < 2) s"RARE BANNER\nbody $i" else s"body $i"
      (i.toLong, "s", t)
    }.toDF("doc_id", "source", "t")
    val out = Boilerplate.headerFooterStrip(docs, "doc_id", "source", "t")
    assert(out.filter(col("n_dropped") > 0).count() == 0)
  }
}
