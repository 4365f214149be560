package graft

import graft.dedup.{Dedup, PrefixJoin}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Round-4j operators, each checked against an independent exact
  * implementation:
  *  1. PrefixJoin.prefixJaccardPairs == the UNCAPPED brute-force
  *     ngramJaccardPairs (completeness of the prefix filter), on
  *     random near-dup corpora and on boundary corners.
  */
class Round4jSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-round4j-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def checkProp(p: Prop, n: Int = 10): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  /** Random corpus with deliberate near-duplicate structure: a few
    * base token sequences, each echoed with small edits, plus noise
    * docs and degenerate short docs (< n tokens → zero shingles).
    */
  private def nearDupCorpus(seed: Long): Seq[(Long, String)] = {
    val rng = new Random(seed)
    val vocab = (0 until 30).map(i => s"w$i")
    def sentence(len: Int): Seq[String] =
      Seq.fill(len)(vocab(rng.nextInt(vocab.size)))
    val bases = (0 until 3).map(_ => sentence(8 + rng.nextInt(10)))
    val docs = scala.collection.mutable.ArrayBuffer[Seq[String]]()
    bases.foreach { b =>
      docs += b
      // echo with an edit: replace one token, or append a couple
      val edited = b.updated(rng.nextInt(b.size), vocab(rng.nextInt(vocab.size)))
      docs += (if (rng.nextBoolean()) edited else b ++ sentence(2))
    }
    docs += sentence(12) // noise
    docs += sentence(2)  // shorter than n=3 → no shingles
    docs.zipWithIndex.map { case (toks, i) => (i.toLong, toks.mkString(" ")) }.toSeq
  }

  test("prefix-filtering join equals uncapped brute-force Jaccard join") {
    import spark.implicits._
    checkProp(Prop.forAll(Gen.choose(0L, 5000L)) { seed =>
      val docs = nearDupCorpus(seed).toDF("doc_id", "text")
      val t = 0.3
      val got = PrefixJoin.prefixJaccardPairs(docs, "doc_id", "text", 3, t)
        .orderBy("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          math.round(r.getDouble(3) * 1e9)))
      val want = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, t,
          maxShingleDf = Int.MaxValue)
        .orderBy("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          math.round(r.getDouble(3) * 1e9)))
      Prop(got.sameElements(want)) :| s"got=${got.toList} want=${want.toList}"
    })
  }

  test("prefix join corners: identical docs, disjoint docs, threshold boundary") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e"),        // identical pair → jaccard 1.0
      (2L, "a b c d e"),
      (3L, "x y z q r"),        // disjoint from 1/2
      (4L, "a b c d q"),        // shares 2 of 3-shingles? "a b c","b c d" with doc 1
      (5L, "p q")               // no shingles at n=3
    ).toDF("doc_id", "text")
    val out = PrefixJoin.prefixJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(out.contains((1L, 2L)) && out((1L, 2L)) == ((3L, 1.0)))
    // docs 1 and 4: shingles(1)={abc,bcd,cde}, shingles(4)={abc,bcd,cdq};
    // common 2, union 4 → 0.5, exactly at the closed threshold
    assert(out.contains((1L, 4L)) && out((1L, 4L)) == ((2L, 0.5)))
    assert(out.contains((2L, 4L)))
    assert(!out.keys.exists { case (a, b) => a == 3L || b == 3L || a == 5L || b == 5L })
  }

  test("chunk-store dedup equals a driver-side regroup of the chunker's output") {
    import spark.implicits._
    // two exact-duplicate docs, one doc sharing a long passage, one noise
    val passage = (0 until 60).map(i => s"p$i").mkString(" ")
    val docs = Seq(
      (1L, passage),
      (2L, passage),
      (3L, passage + " tail x y z"),
      (4L, (0 until 40).map(i => s"n$i").mkString(" "))
    ).toDF("doc_id", "text")
    val chunks = graft.corpus.Cdc.chunks(docs, "doc_id", "text", divisor = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getString(4)))
    // driver-side regroup
    val want = chunks.groupBy(_._4).collect {
      case (sha, g) if g.length >= 2 =>
        val keep = g.map(c => (c._1, c._2)).min
        (sha, g.map(_._3).min, g.length.toLong, g.map(_._1).distinct.length.toLong,
          keep._1, keep._2, (g.length - 1).toLong * g.map(_._3).min)
    }.toSet
    val got = graft.corpus.Cdc.chunkDedup(docs, "doc_id", "text", divisor = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == want)
    assert(got.nonEmpty, "fixture must exercise cross-doc chunk reuse")
    // exact-duplicate docs share every chunk → some sha with n_docs >= 2
    assert(got.exists(_._4 >= 2))
  }

  test("jaro_winkler expression matches DuckDB-probed goldens (byte semantics)") {
    val jw = (a: String, b: String) => graft.functions.JaroWinklerExpr
      .similarity(a.getBytes("UTF-8"), b.getBytes("UTF-8"))
    // goldens probed from duckdb jaro_winkler_similarity this round
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-15)
    assert(math.abs(jw("jellyfish", "smellyfish") - 0.8962962962962964) < 1e-15)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.8400000000000001) < 1e-15)
    assert(jw("", "") == 0.0 && jw("a", "") == 0.0) // DuckDB: empty => 0
    assert(jw("abc", "abc") == 1.0)
    assert(jw("a", "b") == 0.0 && jw("ab", "ba") == 0.0)
    // boost threshold: jaro 0.5 with common prefix 2 stays 0.5
    assert(jw("abcdefgh", "abzzzzzz") == 0.5)
    // byte-level: multi-byte é counts per byte (prefix 4 incl. é bytes)
    assert(math.abs(jw("aaéb", "aaéc") - 0.92) < 1e-15)
    assert(math.abs(jw("abcd", "acbd") - 0.9249999999999999) < 1e-15)
    // long strings differing at position 0 beat 0.9 without any boost —
    // the case that makes first-char blocking incomplete (documented)
    assert(jw("a" + "x" * 19, "b" + "x" * 19) > 0.9)
  }

  test("fuzzy name match surfaces the planted near-identical dictionary pairs") {
    import spark.implicits._
    val df = Seq.tabulate(200)(i =>
      (i.toLong, if (i % 3 == 0) "cold widget" else if (i % 3 == 1) "old widget" else "blue bolt"))
      .toDF("id", "name")
    val out = graft.operators.FuzzyJoin.jaroWinklerPairs(spark, df, "name", 0.9)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(3), r.getLong(4)))
    assert(out.length == 1)
    assert(out.head == (("cold widget", "old widget", 67L, 67L)))
  }
}
