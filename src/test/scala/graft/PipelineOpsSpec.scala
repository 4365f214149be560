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

  // ---- funnel ----------------------------------------------------------

  private def funnel(rows: Seq[(Long, String, Long)], windowUs: Long = Long.MaxValue) = {
    import spark.implicits._
    graft.operators.Funnel.completion(
      rows.toDF("user_id", "event_type", "us"),
      "user_id", "event_type", "us", Seq("a", "b", "c"), windowUs)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))))
      .toMap
  }

  test("funnel advances strictly in time, binds earliest qualifying event") {
    val out = funnel(Seq(
      (1L, "a", 10L), (1L, "b", 20L), (1L, "c", 30L),  // full funnel
      (2L, "b", 5L), (2L, "a", 10L), (2L, "c", 15L),   // b before a: c still after a? b never re-fires
      (3L, "a", 10L), (3L, "b", 10L),                  // tie: b NOT strictly after a
      (4L, "b", 1L), (4L, "c", 2L),                    // no stage-1 at all
      (5L, "a", 10L), (5L, "c", 20L)))                 // skipped stage stays incomplete
    assert(out(1L) == ((3, 10L, 30L)))
    assert(out(2L) == ((1, 10L, 10L)))
    assert(out(3L) == ((1, 10L, 10L)))
    assert(out(4L) == ((0, -1L, -1L)))
    assert(out(5L) == ((1, 10L, 10L)))
  }

  test("funnel window bounds later stages to t1 + W") {
    val ev = Seq(
      (1L, "a", 0L), (1L, "b", 50L), (1L, "c", 200L),  // c outside W=100
      (2L, "a", 0L), (2L, "b", 100L))                  // boundary: inclusive
    val out = funnel(ev, windowUs = 100L)
    assert(out(1L) == ((2, 0L, 50L)))
    assert(out(2L) == ((2, 0L, 100L)))
    // a LATER in-window b can still fire even when an earlier one missed
    val out2 = funnel(Seq(
      (3L, "b", 5L), (3L, "a", 10L), (3L, "b", 60L)), windowUs = 100L)
    assert(out2(3L) == ((2, 10L, 60L)))
  }

  test("funnel equals chained-min brute force on random event logs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val types = Array("a", "b", "c", "x")
    val rows = (0 until 400).map { i =>
      (rnd.nextInt(25).toLong, types(rnd.nextInt(4)), rnd.nextInt(50).toLong)
    }
    val w = 20L
    // brute force: chained min with strict > and window
    val byUser = rows.filter(r => r._2 != "x").groupBy(_._1)
    val expect = byUser.map { case (u, evs) =>
      val t1 = evs.filter(_._2 == "a").map(_._3).sorted.headOption
      val t2 = t1.flatMap(t => evs.filter(e => e._2 == "b" && e._3 > t && e._3 <= t1.get + w)
        .map(_._3).sorted.headOption)
      val t3 = t2.flatMap(t => evs.filter(e => e._2 == "c" && e._3 > t && e._3 <= t1.get + w)
        .map(_._3).sorted.headOption)
      val n = Seq(t1, t2, t3).takeWhile(_.isDefined).size
      u -> ((n, t1.getOrElse(-1L), t3.orElse(t2).orElse(t1).getOrElse(-1L)))
    }
    val got = funnel(rows, windowUs = w)
    assert(got == expect)
  }

  // ---- property: captionAssoc == quadratic brute force -----------------

  test("captionAssoc equals nearest-text brute force on random interleavings") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val kinds = Array("text", "media", "word_box")
    val rows = (0 until 60).flatMap { d =>
      val n = 1 + rnd.nextInt(8)
      (0 until n).map { i =>
        val k = kinds(rnd.nextInt(3))
        (s"d$d", i, k, if (k == "text") s"t$d-$i" else "", if (k == "media") s"m$d-$i" else "")
      }
    }
    val out = Interleave.captionAssoc(rows.toDF("doc_id", "offset", "kind", "text", "media_ref"),
      "doc_id", "offset", "kind", "text", "media_ref")
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getString(5), Option(r.get(3)).map(_.toString).orNull,
          Option(r.getString(4)).orNull))).toMap
    val expect = rows.groupBy(_._1).flatMap { case (doc, evs) =>
      val texts = evs.filter(_._3 == "text").map(e => (e._2, e._4)).sortBy(_._1)
      evs.filter(_._3 == "media").map { m =>
        val next = texts.find(_._1 > m._2)
        val prev = texts.reverse.find(_._1 < m._2)
        val (dir, cap) = next.map(("next", _)).orElse(prev.map(("prev", _)))
          .map { case (d, (o, t)) => (d, (o.toString, t)) }
          .getOrElse(("none", (null, null)))
        (doc, m._2) -> ((dir, cap._1, cap._2))
      }
    }.toMap
    assert(out == expect)
  }

  // ---- property: DSIR weights equal a local model ----------------------

  test("dsir weights equal an exact local reimplementation") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val vocab = Array("aa", "bb", "cc", "dd", "ee", "zz")
    val docs = (0 until 40).map { i =>
      (i.toLong, i < 15,
        (0 until 3 + rnd.nextInt(10)).map(_ => vocab(rnd.nextInt(6))).mkString(" "))
    }
    val got = Dsir.score(docs.toDF("doc_id", "tgt", "text"), "doc_id", "text",
      col("tgt"), buckets = 64, salt = "p")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // local replay: same md5-60 bucket, same micro-nat grid
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16)
    }
    def mn(x: Double): Long = math.floor(StrictMath.log(x) * 1e6 + 0.5).toLong
    val perDoc = docs.map { case (id, tgt, text) =>
      (id, tgt, text.split(" ").filter(_.nonEmpty)
        .map(t => h60("p:" + t) % 64).groupBy(identity).view.mapValues(_.size).toMap)
    }
    val r = collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    val tc = collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for ((_, tgt, bs) <- perDoc; (b, c) <- bs) {
      r(b) += c; if (tgt) tc(b) += c
    }
    val rtot = r.values.sum; val ttot = tc.values.sum
    val cst = mn((rtot + 64).toDouble) - mn((ttot + 64).toDouble)
    val expect = perDoc.map { case (id, _, bs) =>
      val nTok = bs.values.sum.toLong
      val w = bs.map { case (b, c) =>
        c * (mn((tc(b) + 1).toDouble) - mn((r(b) + 1).toDouble)) }.sum + nTok * cst
      id -> ((nTok, w))
    }.toMap
    assert(got == expect)
  }

  // ---- property: headerFooterStrip == local simulation ------------------

  test("headerFooterStrip equals a local per-source simulation on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val docs = (0 until 80).map { i =>
      val src = s"s${i % 4}"
      val body = (0 until 1 + rnd.nextInt(4)).map(j => s"body $i $j").mkString("\n")
      val t = (if (rnd.nextInt(10) < 6) s"HDR $src\n" else "") + body +
        (if (rnd.nextInt(10) < 5) s"\nFTR $src" else "")
      (i.toLong, src, t)
    }
    val got = Boilerplate.headerFooterStrip(docs.toDF("doc_id", "source", "t"),
      "doc_id", "source", "t", k = 2, minNum = 3, minDen = 10)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // local simulation of the same spec
    val bySrc = docs.groupBy(_._2)
    val tmpl = bySrc.map { case (src, ds) =>
      def edge(f: (Array[String], Int) => Boolean) =
        ds.flatMap { case (_, _, t) =>
          val ls = t.split("\n", -1)
          ls.zipWithIndex.filter { case (l, i) => f(ls, i) && l.trim.toLowerCase.nonEmpty }
            .map(_._1.trim.toLowerCase).distinct
        }.groupBy(identity).collect {
          case (k, occ) if occ.size * 10 >= ds.size * 3 => k
        }.toSet
      src -> ((edge((ls, i) => i < 2), edge((ls, i) => i >= ls.length - 2)))
    }
    val expect = docs.map { case (id, src, t) =>
      val (hs, fs) = tmpl(src)
      val ls = t.split("\n", -1)
      val kept = ls.zipWithIndex.filterNot { case (l, i) =>
        val k = l.trim.toLowerCase
        (i < 2 && hs(k)) || (i >= ls.length - 2 && fs(k))
      }.map(_._1)
      id -> ((kept.mkString("\n"), (ls.length - kept.length).toLong))
    }.toMap
    assert(got == expect)
  }

  // ---- Augment (FIM, crops) -------------------------------------------

  test("fimSplit: deterministic, and each segment is a contiguous token run") {
    import spark.implicits._
    import graft.corpus.Augment
    val texts = Map(1L -> "a b c d e f g", 2L -> "", 3L -> "solo")
    val docs = texts.toSeq.toDF("doc_id", "text")
    def run() = Augment.fimSplit(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))).toMap
    val rows = run()
    for ((id, (p, m, sfx, n)) <- rows) {
      val toks = texts(id).split(" ", -1)
      assert(n == toks.length.toLong)
      // prefix/middle/suffix are the three pieces of the token array in
      // order: joining their token lists reproduces it exactly
      def tk(s: String): Seq[String] = if (s.isEmpty) Nil else s.split(" ", -1).toSeq
      val re = tk(p) ++ tk(m) ++ tk(sfx)
      assert(re == toks.filter(_.nonEmpty).toSeq || re == toks.toSeq, s"doc $id: $re")
    }
    assert(rows == run(), "not deterministic")
  }

  test("fimSplit token-count invariant: |prefix|+|middle|+|suffix| == n") {
    import spark.implicits._
    import graft.corpus.Augment
    val docs = (0 until 50).map(i => (i.toLong, (0 to i % 13).map(j => s"t$j").mkString(" ")))
      .toDF("doc_id", "text")
    Augment.fimSplit(docs, "doc_id", "text").collect().foreach { r =>
      def cnt(s: String) = if (s.isEmpty) 0 else s.split(" ", -1).length
      val total = cnt(r.getString(1)) + cnt(r.getString(2)) + cnt(r.getString(3))
      assert(total == r.getLong(4), s"doc ${r.getLong(0)}")
    }
  }

  test("contrastiveCrops: exact window length, in-doc, whole doc when short") {
    import spark.implicits._
    import graft.corpus.Augment
    val long = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, long), (2L, "a b c")).toDF("doc_id", "text")
    val out = Augment.contrastiveCrops(docs, "doc_id", "text", cropLen = 10)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    val (a1, b1) = out(1L)
    assert(a1.split(" ").length == 10 && b1.split(" ").length == 10)
    assert(long.contains(a1) && long.contains(b1))
    assert(out(2L) == (("a b c", "a b c")))
  }

  // ---- DDSketch --------------------------------------------------------

  test("ddsketch quantile bin contains the exact type-1 quantile") {
    import spark.implicits._
    import graft.operators.DdSketch
    val rnd = new scala.util.Random(7)
    val vals = (0 until 2000).map(_ => math.exp(rnd.nextGaussian() * 2.0))
    val df = vals.zipWithIndex.map { case (v, i) => (if (i % 2 == 0) "a" else "b", v) }
      .toDF("g", "v")
    val qs = Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100))
    val out = DdSketch.quantiles(DdSketch.sketch(df, "g", "v"), "g", qs)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    val w = DdSketch.widthMn(0.01)
    for (g <- Seq("a", "b"); (lbl, num, den) <- qs) {
      val gv = vals.zipWithIndex.filter { case (_, i) =>
        (if (i % 2 == 0) "a" else "b") == g }.map(_._1).sorted
      val exact = gv((num.toLong * gv.size + den - 1).toInt / den - 1) // ceil(q*n)-th, 0-based
      val exactMn = math.floor(StrictMath.log(exact) * 1e6 + 0.5).toLong
      val lo = out((g, lbl))
      assert(exactMn >= lo && exactMn < lo + w,
        s"$g/$lbl: exact ln-mn $exactMn outside [$lo, ${lo + w})")
    }
  }

  test("ddsketch merges by adding counts") {
    import spark.implicits._
    import graft.operators.DdSketch
    val a = (1 to 500).map(i => ("g", i * 0.37)).toDF("g", "v")
    val b = (1 to 300).map(i => ("g", i * 1.91)).toDF("g", "v")
    val whole = DdSketch.sketch(a.unionByName(b), "g", "v")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = DdSketch.merge(DdSketch.sketch(a, "g", "v"), DdSketch.sketch(b, "g", "v"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == whole)
  }

  test("ddsketch drops non-positive values and keeps relative error ~alpha") {
    import spark.implicits._
    import graft.operators.DdSketch
    val df = Seq(("g", -1.0), ("g", 0.0), ("g", 100.0), ("g", 101.0), ("g", 102.0))
      .toDF("g", "v")
    val sk = DdSketch.sketch(df, "g", "v")
    assert(sk.agg(sum("cnt")).collect()(0).getLong(0) == 3L)
    // bucket width == ln(gamma): any two values in one bucket differ by
    // at most a factor gamma ~ 1 + 2*alpha
    val q = DdSketch.quantiles(sk, "g", Seq(("p50", 1, 2))).collect()(0)
    val lo = math.exp(q.getLong(3) / 1e6)
    val hi = lo * math.exp(DdSketch.widthMn(0.01) / 1e6)
    assert(lo <= 101.0 && 101.0 < hi * 1.000001)
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
