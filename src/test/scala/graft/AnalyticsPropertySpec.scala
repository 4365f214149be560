package graft

import graft.ann.FeatureHash
import graft.corpus.{InvertedIndex, Quantiles}
import graft.operators.{BloomJoin, PageRank}
import graft.textops.LangModel

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Random-input invariants for the round-4b analytics operators, each
  * checked against an independent local simulation — the same posture
  * as CorpusPropertySpec / GeomPropertySpec.
  */
class AnalyticsPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-analytics-prop-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def word(rng: Random): String =
    (0 until 1 + rng.nextInt(3)).map(_ => "abc".charAt(rng.nextInt(3))).mkString

  test("property: discreteQuantiles equals naive sorted-pick on random grouped data") {
    import spark.implicits._
    for (seed <- 1 to 10) {
      val rng = new Random(seed * 7919L)
      val rows = (0 until 50 + rng.nextInt(150)).map(_ =>
        (s"g${rng.nextInt(4)}", rng.nextInt(40).toLong))
      val qs = Seq(0.25, 0.5, 0.9)
      val got = Quantiles.discreteQuantiles(rows.toDF("lang", "n_chars"), "lang", "n_chars", qs)
        .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2)).toMap
      for ((g, vs) <- rows.groupBy(_._1); q <- qs) {
        val sorted = vs.map(_._2).sorted
        val idx = math.ceil(q * sorted.length).toInt // 1-based target
        assert(got((g, q)) == sorted(idx - 1), s"seed $seed group $g q $q")
      }
    }
  }

  test("property: inverted index postings reconstruct each document exactly") {
    import spark.implicits._
    for (seed <- 1 to 6) {
      val rng = new Random(seed * 15485863L)
      val docs = (0 until 8).map(id =>
        (id.toLong, (0 until 1 + rng.nextInt(30)).map(_ => word(rng)).mkString(" ")))
      // df band wide open: every posting survives
      val got = InvertedIndex.build(docs.toDF("doc_id", "text"), "doc_id", "text",
          minDf = 1, maxDf = Long.MaxValue)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      for ((id, text) <- docs) {
        val toks = text.split(" ", -1).toVector
        // rebuild position -> term from the postings of this doc
        val rebuilt = got.filter(_._2 == id).flatMap { case (term, _, tf, pos) =>
          val ps = pos.split(",").map(_.toInt)
          assert(ps.length == tf && ps.sorted.sameElements(ps), s"seed $seed doc $id term $term")
          ps.map(p => p -> term)
        }.toMap
        assert(rebuilt.size == toks.length, s"seed $seed doc $id size")
        for ((t, i) <- toks.zipWithIndex)
          assert(rebuilt(i + 1) == t, s"seed $seed doc $id pos ${i + 1}")
      }
    }
  }

  test("property: feature hash conserves token mass and stays in range") {
    import spark.implicits._
    for (seed <- 1 to 6) {
      val rng = new Random(seed * 104729L)
      val dim = 1 << (3 + rng.nextInt(4))
      val docs = (0 until 10).map(id =>
        (id.toLong, (0 until rng.nextInt(40)).map(_ => word(rng)).mkString(" ")))
      val got = FeatureHash.features(docs.toDF("doc_id", "text"), "doc_id", "text", dim)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got.forall(t => t._2 >= 0 && t._2 < dim))
      val sums = got.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      for ((id, text) <- docs) {
        val n = text.split(" ", -1).length.toLong // "" splits to one empty token
        assert(sums.getOrElse(id, 0L) == n, s"seed $seed doc $id")
      }
    }
  }

  test("property: bloom-pruned join equals the plain join on random keys") {
    import spark.implicits._
    for (seed <- 1 to 6) {
      val rng = new Random(seed * 6700417L)
      val probe = (0 until 150).map(i => (i.toLong, rng.nextInt(60).toLong)).toDF("row_id", "key")
      val build = (0 until 1 + rng.nextInt(12)).map(_ => rng.nextInt(80).toLong)
        .distinct.map(k => (k, s"p$k")).toDF("bkey", "payload")
      val mBits = 64 << rng.nextInt(3)
      val k = 1 + rng.nextInt(3)
      val plain = probe.join(build, col("key") === col("bkey"))
        .select("row_id", "key", "payload").collect().toSet
      val bloomed = BloomJoin.filteredJoin(probe, build, "key", "bkey",
          mBits, k, s"s$seed")
        .select("row_id", "key", "payload").collect().toSet
      assert(bloomed == plain, s"seed $seed mBits $mBits k $k")
    }
  }

  test("property: pageRank matches a local power iteration on random graphs") {
    import spark.implicits._
    for (seed <- 1 to 4) {
      val rng = new Random(seed * 2147483647L)
      val n = 6 + rng.nextInt(10)
      val fwd = (0 until n * 2).map(_ => (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter(e => e._1 != e._2).distinct
      val edges = (fwd ++ fwd.map(_.swap)).distinct // symmetrize: no dangling
      val iters = 5
      val got = PageRank.pageRank(edges.toDF("src", "dst"), "src", "dst", iters, 0.85)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      // local reference with the same picounit discretization; base is
      // 1.0 - d exactly as the engine folds it (0.15000000000000002,
      // one ulp off the 0.15 literal)
      val base = 1.0 - 0.85
      val out = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      var r = nodes.map(_ -> 1.0).toMap
      for (_ <- 1 to iters) {
        val contrib = edges.map { case (u, v) =>
          v -> math.floor(r(u) / out(u).size * 1e12).toLong
        }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        r = nodes.map(nd =>
          nd -> (base + 0.85 * (contrib.getOrElse(nd, 0L).toDouble / 1e12))).toMap
      }
      assert(got.keySet == r.keySet, s"seed $seed")
      for ((nd, v) <- r)
        assert(got(nd) == v, s"seed $seed node $nd: ${got(nd)} vs $v")
    }
  }

  test("property: KMV overlap estimate matches a local sketch simulation") {
    import spark.implicits._
    def h60(salt: String, v: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest((salt + v).getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    for (seed <- 1 to 5) {
      val rng = new Random(seed * 512927377L)
      val vocab = (0 until 120).map(i => s"w${rng.nextInt(500)}_$i")
      val setA = vocab.filter(_ => rng.nextBoolean()).toSet
      val setB = vocab.filter(_ => rng.nextBoolean()).toSet
      val k = 16 // far below |A u B| -> estimator path
      val rows = setA.toSeq.map(("a", _)) ++ setB.toSeq.map(("b", _))
      val got = graft.operators.Kmv.overlapEstimate(
        rows.toDF("s", "v"), "s", "v", "a", "b", k, salt = s"p$seed")
        .collect().head
      // local simulation over the same portable hash
      val sketch = (setA ++ setB).toSeq
        .map(v => (h60(s"p$seed", v), v)).sortBy(_._1).take(k)
      val hk = sketch.map(_._1).max
      val kint = sketch.count { case (_, v) => setA(v) && setB(v) }
      val estU = (k - 1).toDouble * graft.operators.Kmv.HashSpace / hk
      val jac = kint.toDouble / k
      assert(got.getLong(0) == k.toLong && got.getLong(1) == kint.toLong, s"seed $seed")
      assert(got.getDouble(2) == estU && got.getDouble(3) == jac, s"seed $seed")
      assert(got.getDouble(4) == jac * estU, s"seed $seed")
    }
  }

  test("property: weighted sample matches naive Efraimidis-Spirakis selection") {
    import spark.implicits._
    def h60(salt: String, v: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest((salt + v).getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    for (seed <- 1 to 8) {
      val rng = new Random(seed * 2166136261L)
      val rows = (0 until 120).map(i =>
        (s"g${rng.nextInt(3)}", i.toLong, 1L + rng.nextInt(500)))
      val k = 5
      val sampled = graft.corpus.Sampling.weightedSample(
        rows.toDF("lang", "doc_id", "n_tokens"),
        "lang", "doc_id", "n_tokens", k, s"ws$seed")
      // skew bound: rank-limit pushdown must cap map-side output
      assert(sampled.queryExecution.executedPlan.toString
        .contains("WindowGroupLimit"))
      val got = sampled
        .collect()
        .map(r => (r.getString(0), r.getLong(4)) -> (r.getLong(1), r.getDouble(3)))
        .toMap
      val expected = rows.groupBy(_._1).flatMap { case (g, rs) =>
        rs.map { case (_, id, w) =>
          val u = (h60(s"ws$seed", id.toString) + 1.0) / graft.operators.Kmv.HashSpace
          (id, math.pow(u, 1.0 / w))
        }.sortBy { case (id, key) => (-key, id) }.take(k).zipWithIndex.map {
          case ((id, key), i) => (g, i + 1L) -> (id, key)
        }
      }
      assert(got == expected, s"seed $seed")
    }
  }

  test("property: scoreDocs matches a local bigram-LM simulation") {
    import spark.implicits._
    for (seed <- 1 to 6) {
      val rng = new Random(seed * 999983L)
      val docs = (0 until 8).map(id =>
        (id.toLong, (0 until rng.nextInt(25)).map(_ => word(rng)).mkString(" ")))
      val got = LangModel.scoreDocs(docs.toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      // local simulation
      val pairs = docs.flatMap { case (id, text) =>
        val t = text.split(" ", -1).toVector
        t.zip(t.drop(1)).map(p => (id, p))
      }
      val c12 = pairs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val c1 = pairs.groupBy(_._2._1).view.mapValues(_.size.toLong).toMap
      val v = docs.flatMap(_._2.split(" ", -1)).distinct.size.toLong
      val exp = pairs.groupBy(_._1).view.mapValues { ps =>
        val micros = ps.map { case (_, p) =>
          math.floor(math.log((c12(p) + 1.0) / (c1(p._1) + v)) * 1e6).toLong
        }
        (ps.size.toLong, micros.sum)
      }.toMap
      for ((id, e) <- exp) assert(got(id) == e, s"seed $seed doc $id")
      assert(got.keySet == exp.keySet, s"seed $seed")
    }
  }
}
