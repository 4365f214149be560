package graft

import graft.corpus.{BudgetSelect, Chunking, Decontaminate}
import graft.dedup.Winnow

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Random-input invariants for the round-4 corpus operators, each
  * checked against an independent local simulation — the same posture
  * as GeomPropertySpec for the extraction geometry.
  */
class CorpusPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-corpus-prop-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def word(rng: Random, alphabet: String): String =
    (0 until 1 + rng.nextInt(4)).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString

  test("property: chunking covers every token, overlaps exactly, reconstructs") {
    import spark.implicits._
    for (seed <- 1 to 10) {
      val rng = new Random(seed * 104729L)
      val m = 2 + rng.nextInt(20)
      val v = rng.nextInt(m)
      val stride = m - v
      val docs = (0 until 6).map { id =>
        val n = rng.nextInt(120)
        (id.toLong, (0 until n).map(_ => word(rng, "abcde")).mkString(" "))
      }
      val got = Chunking.chunk(docs.toDF("doc_id", "text"), "doc_id", "text", m, v)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
        .groupBy(_._1)
      for ((id, text) <- docs) {
        val toks = text.split(" ", -1).toVector // matches TextOps.tokens
        val chunks = got(id).sortBy(_._2).toVector
        // local simulation of the start rule
        val starts = 0 to math.max(toks.length - v - 1, 0) by stride
        assert(chunks.map(_._2) == starts.indices.toVector, s"seed $seed doc $id")
        for ((st, i) <- starts.zipWithIndex) {
          val want = toks.slice(st, st + m)
          assert(chunks(i)._3 == want.mkString(" "), s"seed $seed doc $id chunk $i")
          assert(chunks(i)._4 == want.length)
        }
        // coverage + lossless reconstruction
        val covered = chunks.flatMap(c => (c._2 * stride) until (c._2 * stride + c._4))
        assert(covered.toSet == toks.indices.toSet, s"seed $seed doc $id coverage")
        val rebuilt = chunks.head._3.split(" ", -1).toVector ++
          chunks.tail.flatMap(_._3.split(" ", -1).drop(v))
        assert(rebuilt == toks, s"seed $seed doc $id reconstruction")
      }
    }
  }

  test("property: winnowing guarantee holds for random shared passages") {
    import spark.implicits._
    for (seed <- 1 to 8) {
      val rng = new Random(seed * 7919L)
      val k = 2 + rng.nextInt(4)
      val w = 2 + rng.nextInt(4)
      // a shared run of exactly w + k - 1 tokens, embedded at random
      // offsets in otherwise-disjoint docs (distinct alphabets)
      val shared = (0 until (w + k - 1)).map(_ => word(rng, "pqr")).mkString(" ")
      val docA = ((0 until rng.nextInt(20)).map(_ => word(rng, "abc")) :+ shared) ++
        (0 until rng.nextInt(20)).map(_ => word(rng, "abc"))
      val docB = ((0 until rng.nextInt(20)).map(_ => word(rng, "xyz")) :+ shared) ++
        (0 until rng.nextInt(20)).map(_ => word(rng, "xyz"))
      val df = Seq((1L, docA.mkString(" ")), (2L, docB.mkString(" ")))
        .toDF("doc_id", "text")
      val fps = Winnow.fingerprints(df, "doc_id", "text", k, w)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .groupBy(_._1)
      val f1 = fps(1L).map(_._3).toSet
      val f2 = fps(2L).map(_._3).toSet
      assert((f1 & f2).nonEmpty, s"seed $seed (k=$k w=$w): guarantee violated")
      // density: consecutive selected positions at most w apart
      for ((_, rows) <- fps; ps = rows.map(_._2).distinct.sorted)
        for (Array(a, b) <- ps.sliding(2))
          assert(b - a <= w, s"seed $seed gap $a -> $b (w=$w)")
    }
  }

  test("property: native winnow expression == HOF + distinct formulation") {
    import spark.implicits._
    // tiny alphabet + short words => repeated shingles => tie-heavy
    // windows, the adversarial case for the rightmost-min rule and for
    // the adjacent-dedup-equals-distinct claim
    for (seed <- 1 to 8) {
      val rng = new Random(seed * 31337L)
      val k = 1 + rng.nextInt(4)
      val w = 1 + rng.nextInt(5)
      val docs = (0 until 8).map { id =>
        val n = rng.nextInt(60)
        (id.toLong, (0 until n).map(_ => word(rng, "ab")).mkString(" "))
      } ++ Seq(
        (100L, ""), (101L, " "), (102L, "a"), (103L, "a a a a a a a a a a"),
        (104L, "x " * 30 + "x"))
      val df = docs.toDF("doc_id", "text")
      def rows(d: DataFrame) = d.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val native = rows(Winnow.fingerprints(df, "doc_id", "text", k, w))
      val hof = rows(Winnow.fingerprintsHof(df, "doc_id", "text", k, w))
      assert(native == hof, s"seed $seed (k=$k w=$w)")
      // the native emission is already duplicate-free per doc (the
      // contiguous-runs argument) — no distinct needed downstream
      val raw = Winnow.fingerprints(df, "doc_id", "text", k, w).collect()
      assert(raw.length == native.size, s"seed $seed: duplicate rows emitted")
    }
  }

  test("property: budget selection equals the local greedy prefix") {
    import spark.implicits._
    for (seed <- 1 to 10) {
      val rng = new Random(seed * 6007L)
      val rows = (0 until 40).map(i =>
        (i.toLong, 1L + rng.nextInt(50), rng.nextInt(8).toLong))
      val budget = 1L + rng.nextInt(800)
      val want = {
        var cum = 0L
        rows.sortBy { case (id, _, s) => (-s, id) }.flatMap { case (id, tk, s) =>
          cum += tk
          if (cum <= budget) Some(id -> cum) else None
        }.toMap // monotone cum: everything after the first overflow drops
      }
      // the local sim above keeps accumulating cum past overflow, which
      // matches the window's inclusive running sum (monotone, so every
      // post-overflow row fails the filter just like the operator)
      val got = BudgetSelect.selectUnderBudget(
          rows.toDF("doc_id", "n_tokens", "score"),
          "doc_id", "n_tokens", "score", budget)
        .select("doc_id", "cum_tokens").as[(Long, Long)].collect().toMap
      assert(got == want, s"seed $seed budget $budget")
    }
  }

  test("property: salted top-k shingles equal the naive local top-k") {
    import spark.implicits._
    import graft.corpus.CorpusStats
    for (seed <- 1 to 6) {
      val rng = new Random(seed * 2741L)
      val n = 2
      val k = 1 + rng.nextInt(6)
      val docs = (0 until 20).map { i =>
        val lang = Seq("en", "de", "fr")(rng.nextInt(3))
        (lang, (0 until rng.nextInt(30)).map(_ => word(rng, "ab")).mkString(" "))
      }
      // local ground truth: count shingles per (lang, shingle), rank by
      // (cnt desc, shingle asc), keep rank <= k
      val want = docs
        .flatMap { case (lang, text) =>
          val toks = text.split(" ", -1).toVector
          if (toks.length < n) Nil
          else (0 to toks.length - n).map(j => (lang, toks.slice(j, j + n).mkString(" ")))
        }
        .groupBy(identity).map { case ((lang, sh), occ) => (lang, sh, occ.size.toLong) }
        .groupBy(_._1).flatMap { case (_, rows) =>
          rows.toVector.sortBy { case (_, sh, c) => (-c, sh) }.take(k)
            .zipWithIndex.map { case ((lang, sh, c), i) => (lang, sh, c, i + 1) }
        }.toSet
      val top = CorpusStats.topShinglesPerGroup(
        docs.toDF("lang", "text"), "lang", "text", n, k)
      val got = top.collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
        .toSet
      assert(got == want, s"seed $seed k=$k")
      // skew bound: rank-limit pushdown must cap map-side output
      assert(top.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
    }
  }

  test("property: tfidf and per-doc top terms equal the local computation") {
    import spark.implicits._
    import graft.corpus.CorpusStats
    for (seed <- 1 to 6) {
      val rng = new Random(seed * 911L)
      val docs = (0 until 12).map(i =>
        (i.toLong, (0 until 5 + rng.nextInt(40)).map(_ => word(rng, "abc")).mkString(" ")))
      val tfLocal = docs.flatMap { case (id, text) =>
        text.split(" ", -1).groupBy(identity).map { case (t, o) => (id, t, o.length.toLong) }
      }
      val dfLocal = tfLocal.groupBy(_._2).map { case (t, rows) => t -> rows.size.toLong }
      val nDocs = docs.size.toDouble
      val want = tfLocal.filter(_._3 >= 2).map { case (id, t, tf) =>
        (id, t) -> (tf, dfLocal(t), tf * math.log(nDocs / dfLocal(t)))
      }.toMap
      val got = CorpusStats.tfidf(docs.toDF("doc_id", "text"), "doc_id", "text", minTf = 2)
        .collect()
        .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3), r.getDouble(4)))
        .toMap
      assert(got.keySet == want.keySet, s"seed $seed")
      for ((k, (tf, df, s)) <- want) {
        assert(got(k)._1 == tf && got(k)._2 == df, s"seed $seed $k")
        assert(math.abs(got(k)._3 - s) < 1e-12, s"seed $seed $k score")
      }
      // ranked view: per-doc top-2 by (tfidf desc, term asc)
      val wantTop = want.toSeq
        .map { case ((id, t), (_, _, s)) => (id, t, s) }
        .groupBy(_._1).flatMap { case (_, rows) =>
          rows.sortBy { case (_, t, s) => (-s, t) }.take(2)
            .zipWithIndex.map { case ((id, t, _), i) => (id, t, i + 1) }
        }.toSet
      val gotTop = CorpusStats.topTermsPerDoc(
          docs.toDF("doc_id", "text"), "doc_id", "text", m = 2, minTf = 2)
        .select("doc_id", "term", "rank")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
      assert(gotTop == wantTop, s"seed $seed top terms")
    }
  }

  test("property: decontamination hits equal local shingle-set intersection") {
    import spark.implicits._
    for (seed <- 1 to 8) {
      val rng = new Random(seed * 3571L)
      val n = 2 + rng.nextInt(3)
      def doc(): Vector[String] =
        (0 until rng.nextInt(40)).map(_ => word(rng, "abcd")).toVector
      val bench = (0 until 3).map(i => (100L + i, doc()))
      val corpus = (0 until 8).map(i => (i.toLong, doc()))
      def shingles(toks: Vector[String]): Set[String] =
        if (toks.length < n) Set.empty
        else (0 to toks.length - n).map(j => toks.slice(j, j + n).mkString(" ")).toSet
      val benchSet = bench.flatMap(b => shingles(b._2)).toSet
      val want = corpus.map { case (id, toks) => id -> (shingles(toks) & benchSet).size.toLong }
        .filter(_._2 >= 1).toMap
      val got = Decontaminate.contaminationHits(
          corpus.map { case (id, t) => (id, t.mkString(" ")) }.toDF("doc_id", "text"),
          bench.map { case (id, t) => (id, t.mkString(" ")) }.toDF("doc_id", "text"),
          "doc_id", "text", "doc_id", "text", n = n)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"seed $seed n=$n")
    }
  }

  test("property: bm25 equals the local computation, term-sorted fold included") {
    import spark.implicits._
    import graft.corpus.CorpusStats
    val (k1, b) = (1.2, 0.75)
    for (seed <- 1 to 6) {
      val rng = new Random(seed * 1237L)
      val docs = (0 until 15).map(i =>
        (i.toLong, (0 until 3 + rng.nextInt(30)).map(_ => word(rng, "abc")).mkString(" ")))
      val queryTerms = Seq("a", "ab", "abc")
      val toks = docs.map { case (id, text) => id -> text.split(" ", -1).filter(_.nonEmpty) }
      val dl = toks.map { case (id, ts) => id -> ts.length.toLong }.toMap
      val nDocs = dl.size.toLong
      val avgdl = dl.values.sum.toDouble / nDocs
      val tf = toks.flatMap { case (id, ts) =>
        ts.filter(queryTerms.contains).groupBy(identity)
          .map { case (t, o) => (id, t, o.length.toLong) }
      }
      val dfm = tf.groupBy(_._2).map { case (t, rows) => t -> rows.size.toLong }
      // per-(doc, term) IEEE formula, then LEFT fold in term order —
      // the exact accumulation the operator and the oracle both use
      val want = tf.groupBy(_._1).map { case (id, rows) =>
        val sorted = rows.sortBy(_._2)
        val score = sorted.foldLeft(0.0) { case (acc, (_, t, f)) =>
          // StrictMath, not math.log: Catalyst's Log codegen calls
          // java.lang.StrictMath.log, which can differ from Math.log
          // by 1 ulp on some inputs; the micro-nat floor then absorbs
          // exactly that class of divergence vs the libm-based oracle
          val idf = math.floor(StrictMath.log(
            1.0 + (nDocs - dfm(t) + 0.5) / (dfm(t) + 0.5)) * 1000000.0 + 0.5) / 1000000.0
          acc + (idf * (f * (k1 + 1.0))) / (f + k1 * (1.0 - b + b * dl(id) / avgdl))
        }
        id -> (sorted.size.toLong, score)
      }
      val got = CorpusStats.bm25(docs.toDF("doc_id", "text"), "doc_id", "text",
          queryTerms, k1, b)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(got.keySet == want.keySet, s"seed $seed")
      for ((id, (nm, s)) <- want)
        assert(got(id)._1 == nm && got(id)._2 == s, s"seed $seed doc $id: ${got(id)} vs ($nm, $s)")
    }
  }
}
