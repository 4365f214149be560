package graft

import graft.textops.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Random-input invariants for the quality-gate operators (Gopher
  * panel, mojibake, readability, blocklist, spectrum), each checked
  * against an independent local simulation.
  */
class QualityPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-quality-prop-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val words = Vector("the", "of", "and", "data", "x1", "##", "12",
    "strength", "idea", "cafÃ©", "donâ€™t", "�", "ab",
    "big", "bigger", "slow", "hash.", "...", "…end")
  private val lineStarts = Vector("", "- ", "* ", "• ", "  ")
  private val lineEnds = Vector("", "...", "…", ".")

  private def randomText(rng: Random): String = {
    val nLines = 1 + rng.nextInt(4)
    (0 until nLines).map { _ =>
      val toks = (0 until 1 + rng.nextInt(8)).map(_ => words(rng.nextInt(words.size)))
      lineStarts(rng.nextInt(lineStarts.size)) +
        toks.mkString(" ") + lineEnds(rng.nextInt(lineEnds.size))
    }.mkString("\n")
  }

  private def localSubstrCount(t: String, pat: String): Long = {
    var i = 0; var n = 0L
    while ({ i = t.indexOf(pat, i); i >= 0 }) { n += 1; i += pat.length }
    n
  }

  test("property: gopher signals equal the local simulation") {
    import spark.implicits._
    for (seed <- 1 to 6) {
      val rng = new Random(seed * 7919L)
      val docs = (0 until 24).map(i => (i.toLong, randomText(rng)))
      val got = docs.toDF("id", "t")
        .select(col("id"),
          TextOps.tokenCount(col("t")),
          TextOps.meanWordLength(col("t")),
          TextOps.symbolWordRatio(col("t")),
          TextOps.bulletLineRatio(col("t")),
          TextOps.ellipsisLineRatio(col("t")),
          TextOps.alphaWordRatio(col("t")))
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
      docs.foreach { case (id, t) =>
        val w = t.split(" ", -1)
        val ls = t.split("\n", -1)
        val nW = w.length.toLong
        val meanWlen = w.map(_.length.toLong).sum.toDouble / math.max(nW, 1L)
        val sym = (localSubstrCount(t, "#") + localSubstrCount(t, "...") +
          localSubstrCount(t, "…")).toDouble / math.max(nW, 1L)
        // search semantics like rlike, NOT matches(): a full-match ".*"
        // tail cannot span an embedded NEL (U+0085 is a Java-regex line
        // terminator), which is exactly the class of input this fuzzes
        val bullet = ls.count(l =>
          "^\\s*[-*•]".r.findFirstIn(l).isDefined).toDouble /
          math.max(ls.length, 1)
        val ell = ls.count { l =>
          val r0 = l.replaceAll(" +$", "")
          "(\\.\\.\\.|…)$".r.findFirstIn(r0).isDefined
        }.toDouble / math.max(ls.length, 1)
        val alpha = w.count(_.exists(c => (c >= 'a' && c <= 'z') ||
          (c >= 'A' && c <= 'Z'))).toDouble / math.max(nW, 1L)
        val (gN, gMean, gSym, gBul, gEll, gAlpha) = got(id)
        assert(gN == nW, s"seed $seed id $id words")
        assert(gMean == meanWlen, s"seed $seed id $id mean")
        assert(gSym == sym, s"seed $seed id $id sym")
        assert(gBul == bullet, s"seed $seed id $id bullet")
        assert(gEll == ell, s"seed $seed id $id ellipsis")
        assert(gAlpha == alpha, s"seed $seed id $id alpha")
      }
    }
  }

  test("property: mojibake counts equal the local simulation") {
    import spark.implicits._
    for (seed <- 7 to 10) {
      val rng = new Random(seed * 6007L)
      val docs = (0 until 24).map { i =>
        val base = randomText(rng)
        val extra = if (rng.nextBoolean()) "x" else ""
        (i.toLong, base + extra)
      }
      val got = docs.toDF("id", "t")
        .select(col("id"),
          TextOps.replacementCount(col("t")),
          TextOps.c1ControlCount(col("t")),
          TextOps.mojibakeArtifactCount(col("t")))
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      docs.foreach { case (id, t) =>
        val repl = localSubstrCount(t, "�")
        val c1 = t.count(c => c >= 0x80 && c <= 0x9f).toLong
        val arti = TextOps.MojibakeArtifacts.map(localSubstrCount(t, _)).sum
        assert(got(id) == ((repl, c1, arti)), s"seed $seed id $id")
      }
    }
  }

  test("property: readability signals equal the local simulation") {
    import spark.implicits._
    for (seed <- 11 to 14) {
      val rng = new Random(seed * 4001L)
      val docs = (0 until 24).map(i => (i.toLong, randomText(rng)))
      val got = docs.toDF("id", "t")
        .select(col("id"),
          TextOps.sentenceCount(col("t")),
          TextOps.syllableEstimate(col("t")))
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      docs.foreach { case (id, t) =>
        val sents = math.max("[.!?]+".r.findAllIn(t).length, 1).toLong
        val syll = t.toLowerCase.split(" ", -1)
          .map(w => math.max("[aeiouy]+".r.findAllIn(w).length, 1).toLong).sum
        assert(got(id) == ((sents, syll)), s"seed $seed id $id")
      }
    }
  }

  test("property: blocklistHits equals the local boundary-regex count") {
    import spark.implicits._
    val bl = Seq("big", "slow", "hash")
    for (seed <- 15 to 18) {
      val rng = new Random(seed * 10093L)
      val docs = (0 until 24).map(i => (i.toLong, randomText(rng)))
      val got = docs.toDF("id", "t")
        .select(col("id"), TextOps.blocklistHits(col("t"), bl))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      docs.foreach { case (id, t) =>
        val want = bl.map(w =>
          ("\\b" + w + "\\b").r.findAllIn(t.toLowerCase).length.toLong).sum
        assert(got(id) == want, s"seed $seed id $id")
      }
    }
  }
}
