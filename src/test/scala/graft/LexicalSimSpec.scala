package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Sparse lexical top-k: hand-computed integer scores on a tiny
  * corpus (micro-nat idf replayed with StrictMath like the engine),
  * df-band exclusions, tie-break ordering, and score symmetry.
  */
class LexicalSimSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-lexsim-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val docs = Seq(
    (1L, "apple banana"),
    (2L, "apple banana"),
    (3L, "apple cherry"),
    (4L, "unique"))

  private def run(k: Int, dfCap: Long): Seq[(Long, Long, Long, Int)] = {
    import spark.implicits._
    graft.corpus.LexicalSim.topKSimilar(
        docs.toDF("doc_id", "text"), "doc_id", "text", k = k, dfCap = dfCap)
      .as[(Long, Long, Long, Int)].collect().toSeq.sorted
  }

  private def idfm(n: Long, df: Long): Long =
    math.floor(StrictMath.log(n.toDouble / df) * 1e6 + 0.5).toLong

  test("hand scores: banana-only band (dfCap=2 excludes apple, df=1 moot)") {
    val s = idfm(4, 2) // banana
    assert(run(k = 5, dfCap = 2) == Seq((1L, 2L, s, 1), (2L, 1L, s, 1)))
  }

  test("hand scores with apple in band; ties rank by neighbor id") {
    val ba = idfm(4, 2); val ap = idfm(4, 3)
    val got = run(k = 5, dfCap = 3)
    assert(got == Seq(
      (1L, 2L, ba + ap, 1), (1L, 3L, ap, 2),
      (2L, 1L, ba + ap, 1), (2L, 3L, ap, 2),
      (3L, 1L, ap, 1), (3L, 2L, ap, 2)), got)
  }

  test("k truncates per doc and symmetry holds on surviving full lists") {
    val got = run(k = 1, dfCap = 3)
    assert(got.map(r => (r._1, r._4)) == Seq((1L, 1), (2L, 1), (3L, 1)))
    assert(got.forall(_._4 == 1))
  }

  test("repeated tokens multiply: tf product scales the term weight") {
    import spark.implicits._
    val d2 = Seq((1L, "w w w"), (2L, "w w"), (3L, "w"))
    val got = graft.corpus.LexicalSim.topKSimilar(
        d2.toDF("doc_id", "text"), "doc_id", "text", k = 5, dfCap = 10)
      .as[(Long, Long, Long, Int)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val u = idfm(3, 3) // ln(1) -> 0: df == N makes idf zero
    assert(u == 0L && got((1L, 2L)) == 6 * u && got((2L, 3L)) == 2 * u)
  }
}
