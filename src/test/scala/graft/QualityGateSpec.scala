package graft

import graft.corpus.Sampling
import graft.textops.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gopher rule panel, mojibake detection, fractional-epoch upsampling. */
class QualityGateSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-qualitygate-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def one(text: String, c: org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq(text).toDF("t").select(c).head().get(0)
  }

  test("meanWordLength / symbolWordRatio exact on hand strings") {
    assert(one("ab cdef", TextOps.meanWordLength(col("t"))) == 3.0)
    // 2 '#' + 1 '...' + 1 '…' over 4 tokens = 4/4
    assert(one("a# b#... c… d", TextOps.symbolWordRatio(col("t"))) == 1.0)
    // '....' contains exactly one full '...' run
    assert(one("w ....", TextOps.symbolWordRatio(col("t"))) == 0.5)
  }

  test("bullet / ellipsis / alpha ratios count the right lines and words") {
    val t = "- one\n  • two\nplain\n* three"
    assert(one(t, TextOps.bulletLineRatio(col("t"))) == 0.75)
    val e = "teaser...\ndone.\nmore…  \nx"
    assert(one(e, TextOps.ellipsisLineRatio(col("t"))) == 0.5)
    assert(one("ab 12 c3 ##", TextOps.alphaWordRatio(col("t"))) == 0.5)
  }

  test("gopherPass composes: prose passes, bullet-spam and symbol-spam fail") {
    val prose = "the cat and the dog have fun with all of that stuff today"
    assert(one(prose, TextOps.gopherPass(col("t"), minWords = 5L)) == true)
    // >= 90% bullet lines
    val bullets = (1 to 10).map(i => s"- the item $i of that").mkString("\n")
    assert(one(bullets, TextOps.gopherPass(col("t"), minWords = 5L)) == false)
    // symbol ratio >= 0.1
    val spam = "the cat and the dog # # # have fun with # that"
    assert(one(spam, TextOps.gopherPass(col("t"), minWords = 5L)) == false)
    // word count below the floor
    assert(one("the of and", TextOps.gopherPass(col("t"), minWords = 5L)) == false)
  }

  test("mojibake signals: replacement, C1 controls, artifact digraphs") {
    val t = "cafÃ© donâ€™t �� xy"
    assert(one(t, TextOps.replacementCount(col("t"))) == 2L)
    assert(one(t, TextOps.c1ControlCount(col("t"))) == 1L)
    assert(one(t, TextOps.mojibakeArtifactCount(col("t"))) == 2L)
    assert(one(t, TextOps.isEncodingDamaged(col("t"))) == true)
    assert(one("clean café text", TextOps.isEncodingDamaged(col("t"))) == false)
    // plain U+00C3 not followed by an artifact tail stays clean
    assert(one("Ã alone", TextOps.mojibakeArtifactCount(col("t"))) == 0L)
  }

  test("syllable / sentence / Flesch exact on hand strings") {
    // "strength" 1 group, "aeiou" 1 group, "xyz" has y -> 1, "k9" floor 1
    assert(one("strength aeiou xyz k9", TextOps.syllableEstimate(col("t"))) == 4L)
    // "idea" -> i,ea = 2 groups
    assert(one("idea", TextOps.syllableEstimate(col("t"))) == 2L)
    assert(one("One. Two! Three?? none", TextOps.sentenceCount(col("t"))) == 3L)
    assert(one("no punctuation here", TextOps.sentenceCount(col("t"))) == 1L)
    // 2 words, 1 sentence, 2 syllables: 206.835 - 1.015*2 - 84.6*1
    assert(one("dog cat", TextOps.fleschReadingEase(col("t"))) ==
      206.835 - 1.015 * 2.0 - 84.6 * 1.0)
  }

  test("blocklistHits: word boundaries, case fold, no substring hits") {
    val bl = Seq("slow", "hash", "big")
    assert(one("Big, slow! hash.", TextOps.blocklistHits(col("t"), bl)) == 3L)
    assert(one("bigger hashing slowly", TextOps.blocklistHits(col("t"), bl)) == 0L)
    assert(one("big big BIG", TextOps.blocklistHits(col("t"), bl)) == 3L)
    intercept[IllegalArgumentException] {
      TextOps.blocklistHits(col("t"), Seq("a.b"))
    }
  }

  test("frequencySpectrum counts terms per frequency") {
    import spark.implicits._
    val df = Seq("a b a", "b c c c").toDF("text")
    val spec = graft.corpus.CorpusStats.frequencySpectrum(df, "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // a:2 b:2 c:3 -> freq 2 has 2 terms, freq 3 has 1 term
    assert(spec == Map(2L -> 2L, 3L -> 1L))
  }

  test("zipfFit recovers the slope of an exact power law") {
    import spark.implicits._
    // term t_r appears round(1000 / r) times => ln(freq) ~ ln(1000) - 1*ln(rank)
    val text = (1 to 20).flatMap(r => Seq.fill(math.round(1000.0 / r).toInt)(s"t$r"))
      .mkString(" ")
    val fit = graft.corpus.CorpusStats.zipfFit(Seq(text).toDF("text"), "text", topR = 20)
      .collect().head
    assert(fit.getLong(0) == 20L)
    val slope = fit.getDouble(1)
    assert(slope > -1.01 && slope < -0.99, s"slope=$slope")
    val intercept = fit.getDouble(2)
    assert(math.abs(intercept - math.log(1000.0)) < 0.02, s"intercept=$intercept")
  }

  test("zipfFit is invariant to input partitioning") {
    import spark.implicits._
    val docs = (1 to 40).map(i => ((i % 7) + 1 to 10).map(r => s"w$r").mkString(" "))
    val a = graft.corpus.CorpusStats.zipfFit(docs.toDF("text").repartition(1), "text", 8)
    val b = graft.corpus.CorpusStats.zipfFit(docs.toDF("text").repartition(13), "text", 8)
    assert(a.collect().toSeq == b.collect().toSeq)
  }

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "lang")
  }

  test("epochUpsample: integer epochs repeat exactly, 0 drops, copy_idx dense") {
    val df = docs((1L, "a"), (2L, "a"), (3L, "b"), (4L, "c"))
    val out = Sampling.epochUpsample(df, "lang", "doc_id",
      Map("a" -> 3.0, "b" -> 0.0), defaultEpochs = 1.0).collect()
    val byDoc = out.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).sorted).toMap
    assert(byDoc(1L).toSeq == Seq(0L, 1L, 2L))
    assert(byDoc(2L).toSeq == Seq(0L, 1L, 2L))
    assert(!byDoc.contains(3L))
    assert(byDoc(4L).toSeq == Seq(0L))
  }

  test("epochUpsample: fractional extra copy follows the portable hash threshold") {
    val ids = (0L until 200L).toSeq
    val df = docs(ids.map(i => (i, "a")): _*)
    val out = Sampling.epochUpsample(df, "lang", "doc_id", Map("a" -> 2.5))
    val counts = out.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // expected: 2 + [hash < 500000], replayed via the same column expr
    val hashes = df.select(col("doc_id"),
        Sampling.portableHash(col("doc_id"), "graftep").as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach { i =>
      val want = 2L + (if (hashes(i) < 500000L) 1L else 0L)
      assert(counts(i) == want, s"doc $i")
    }
    // the fractional mass is actually exercised both ways
    assert(counts.values.toSet == Set(2L, 3L))
    // deterministic across runs
    val again = Sampling.epochUpsample(df, "lang", "doc_id", Map("a" -> 2.5))
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == counts)
  }

  test("epochUpsample: sub-1.0 epochs degrade to mixture-sample keep semantics") {
    val ids = (0L until 200L).toSeq
    val df = docs(ids.map(i => (i, "a")): _*)
    val kept = Sampling.epochUpsample(df, "lang", "doc_id", Map("a" -> 0.3))
      .collect()
    assert(kept.forall(_.getLong(2) == 0L)) // single copy each
    val hashes = df.select(col("doc_id"),
        Sampling.portableHash(col("doc_id"), "graftep").as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wantIds = ids.filter(i => hashes(i) < 300000L).toSet
    assert(kept.map(_.getLong(0)).toSet == wantIds)
    assert(wantIds.nonEmpty && wantIds.size < ids.size)
  }
}
