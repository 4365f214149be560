package graft

import graft.operators.EditJoin
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Lossless-blocking gate for the edit-distance similarity join: the
  * filter-and-verify plan must reproduce the brute-force O(n^2)
  * answer exactly — on seeded random corpora that cross the
  * short/gram path boundary, repeats, and empty strings.
  */
class EditJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-editjoin-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def bruteForce(rows: Seq[(Long, String)], k: Int): Set[(Long, Long, Int)] =
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
      d = lev(sa, sb) if d <= k
    } yield (ia, ib, d)).toSet

  private def run(rows: Seq[(Long, String)], k: Int, q: Int = 2): Set[(Long, Long, Int)] = {
    import spark.implicits._
    EditJoin.similarPairs(rows.toDF("doc_id", "text"), "doc_id", "text", k, q)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("handwritten corpus across both paths, k=1 and k=2") {
    val rows = Seq(
      1L -> "table extraction", 2L -> "table extraction", // exact dup
      3L -> "table extractio", 4L -> "cable extraction", // 1 edit
      5L -> "tbl", 6L -> "tal", 7L -> "tb", // short path
      8L -> "", 9L -> "a", // empty + 1-char
      10L -> "completely different")
    for (k <- Seq(0, 1, 2)) {
      assert(run(rows, k) == bruteForce(rows, k), s"k=$k")
    }
  }

  test("seeded random corpora match brute force (property gate)") {
    val rnd = new scala.util.Random(20260817L)
    val alphabet = "abc"
    for (trial <- 0 until 6) {
      val n = 24 + rnd.nextInt(16)
      val rows = (0 until n).map { i =>
        val len = rnd.nextInt(10) // 0..9 crosses the cutoff for k<=2,q=2
        i.toLong -> Seq.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString
      }
      val k = 1 + rnd.nextInt(2)
      assert(run(rows, k) == bruteForce(rows, k), s"trial=$trial k=$k rows=$rows")
    }
  }

  test("repeated grams exercise the occurrence-indexed multiset keys") {
    val rows = Seq(1L -> "aaaaaaaa", 2L -> "aaaaaaab", 3L -> "aaaaaaaa",
      4L -> "aabaaaba", 5L -> "bbbbbbbb")
    for (k <- Seq(1, 2)) assert(run(rows, k) == bruteForce(rows, k), s"k=$k")
  }
}
