package graft

import graft.corpus.Interleave
import graft.dedup.LineDedup
import graft.extract.TableTypes
import graft.operators.SpanDiff
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Random-input invariants for the round-4c operators, each checked
  * against an independent local simulation — the same posture as
  * AnalyticsPropertySpec / CorpusPropertySpec.
  */
class RoundCPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-roundc-prop-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("property: stripDuplicatedLines equals the local frequency cut") {
    import spark.implicits._
    val vocab = Vector("Nav | Bar", "unique", "body text", "Footer Inc",
      " spaced ", "MIXED case", "mixed CASE", "", "  ")
    for (seed <- 1 to 6) {
      val rng = new Random(seed * 104729L)
      val maxDocs = 1 + rng.nextInt(3)
      val docs = (0 until 12).map { id =>
        val lines = (0 until 1 + rng.nextInt(8))
          .map(_ => vocab(rng.nextInt(vocab.size)))
        (id.toLong, lines.mkString("\n"))
      }
      // local: distinct-doc frequency per normalized non-empty key
      val freq = docs
        .flatMap { case (id, t) =>
          t.split("\n", -1).map(_.trim.toLowerCase).filter(_.nonEmpty)
            .distinct.map(k => (k, id))
        }
        .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
      val want = docs.map { case (id, t) =>
        val kept = t.split("\n", -1).filter { l =>
          val k = l.trim.toLowerCase
          k.nonEmpty && freq(k) <= maxDocs
        }
        (id, kept.mkString("\n"), kept.length.toLong)
      }.toSet
      val got = LineDedup.stripDuplicatedLines(
          docs.toDF("doc_id", "t"), "doc_id", "t", maxDocs)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got == want, s"seed $seed maxDocs $maxDocs")
    }
  }

  test("property: spanDiff equals the local positional comparison") {
    import spark.implicits._
    for (seed <- 1 to 6) {
      val rng = new Random(seed * 7919L)
      val ids = (0 until 10).map(i => s"d$i")
      def seq(rng: Random): Vector[(Int, String, String)] =
        (0 until rng.nextInt(6)).map(p =>
          (p, s"k${rng.nextInt(2)}", s"t${rng.nextInt(3)}")).toVector
      val a = ids.flatMap { id =>
        val r2 = new Random((id + seed + "a").hashCode)
        seq(r2).map { case (p, k, t) => (id, p, k, t) }
      }
      val b = ids.flatMap { id =>
        val r2 = new Random((id + seed + (if (rng.nextBoolean()) "a" else "b")).hashCode)
        seq(r2).map { case (p, k, t) => (id, p, k, t) }
      }
      val am = a.groupBy(_._1).view
        .mapValues(_.map(r => r._2 -> (r._3, r._4)).toMap).toMap
      val bm = b.groupBy(_._1).view
        .mapValues(_.map(r => r._2 -> (r._3, r._4)).toMap).toMap
      val want = (am.keySet ++ bm.keySet).map { id =>
        val av = am.getOrElse(id, Map.empty)
        val bv = bm.getOrElse(id, Map.empty)
        val mism = (av.keySet ++ bv.keySet)
          .filter(p => av.get(p) != bv.get(p))
        val first = if (mism.isEmpty) None else Some(mism.min)
        (id, first, av.size.toLong, bv.size.toLong,
          if (first.isEmpty) "equal" else "diverged")
      }
      val got = SpanDiff.diff(
          a.toDF("id", "pos", "kind", "text"),
          b.toDF("id", "pos", "kind", "text"),
          "id", "pos", Seq("kind", "text"))
        .collect().map(r => (r.getString(0),
          if (r.isNullAt(1)) None else Some(r.getInt(1)),
          r.getLong(2), r.getLong(3), r.getString(4))).toSet
      // docs with empty sequences on both sides never appear
      assert(got == want.filter(w => w._3 > 0 || w._4 > 0), s"seed $seed")
    }
  }

  test("property: inferColumnTypes equals the local majority vote") {
    import spark.implicits._
    val cellVocab = Vector("42", "-7", "3.5", "2024-01-09", "true", "false",
      "word", "", "x y")
    for (seed <- 1 to 6) {
      val rng = new Random(seed * 15485863L)
      val cells = for {
        d <- 0 until 4
        t <- 0 until 1 + rng.nextInt(2)
        i <- 1 to 1 + rng.nextInt(4)
        j <- 1 to 1 + rng.nextInt(3)
      } yield (s"doc$d", t, i, j, cellVocab(rng.nextInt(cellVocab.size)))
      def cls(c: String): String =
        if (c.isEmpty) "empty"
        else if (c.matches("[+-]?[0-9]+")) "int"
        else if (c.matches("[+-]?[0-9]+\\.[0-9]+")) "num"
        else if (c.matches("[0-9]{4}-[0-9]{2}-[0-9]{2}")) "date"
        else if (c == "true" || c == "false") "bool"
        else "text"
      val want = cells.groupBy(c => (c._1, c._2, c._4)).flatMap {
        case ((d, t, j), rows) =>
          val body = rows.filter(_._3 > 1)
          if (body.isEmpty) None
          else {
            val hist = body.groupBy(r => cls(r._5)).view.mapValues(_.size).toSeq
            val (ct, _) = hist.minBy { case (typ, n) => (-n, typ) }
            val hdr = rows.find(_._3 == 1).map(r => cls(r._5)).getOrElse("none")
            Some((d, t, j, ct, body.size.toLong, hdr))
          }
      }.toSet
      val got = TableTypes.inferColumnTypes(
          cells.toDF("doc_id", "table_idx", "i", "j", "txt"))
        .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2),
          r.getString(3), r.getLong(4), r.getString(5))).toSet
      assert(got == want, s"seed $seed")
    }
  }

  test("property: interleave profile equals the local scan") {
    import spark.implicits._
    val kinds = Vector("text", "word_box", "media")
    for (seed <- 1 to 6) {
      val rng = new Random(seed * 6700417L)
      val spans = (0 until 8).flatMap { d =>
        (0 until 1 + rng.nextInt(10)).map(p =>
          (s"d$d", p, kinds(rng.nextInt(3))))
      }
      val want = spans.groupBy(_._1).map { case (id, rows) =>
        val ks = rows.sortBy(_._2).map(_._3)
        (id, ks.size.toLong,
          ks.count(_ == "text").toLong, ks.count(_ == "word_box").toLong,
          ks.count(_ == "media").toLong,
          ks.sliding(2).count(w => w.size == 2 && w(0) != w(1)).toLong,
          ks.head, ks.last)
      }.toSet
      val got = Interleave.profile(
          spans.toDF("doc_id", "offset", "kind"), "doc_id", "offset", "kind")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getString(6),
          r.getString(7))).toSet
      assert(got == want, s"seed $seed")
    }
  }
}
