package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** k-core peeling: hand-checked cores on tiny graphs — cascade peeling
  * (pendant chain unravels), convergence idempotence (extra rounds are
  * no-ops), symmetrization, and duplicate-edge dedup.
  */
class KCoreSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-kcore-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def run(edges: Seq[(Long, Long)], k: Int, rounds: Int): Map[Long, Long] = {
    import spark.implicits._
    graft.operators.KCore.kcore(edges.toDF("src", "dst"), "src", "dst", k, rounds)
      .as[(Long, Long)].collect().toMap
  }

  // triangle 1-2-3 plus a pendant chain 3-4, 4-5
  private val triChain = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 4L, 4L -> 5L)

  test("2-core of triangle+chain peels the chain via cascade") {
    // round 1 drops 5 (deg 1); round 2 drops 4 (its deg fell to 1)
    val got = run(triChain, k = 2, rounds = 3)
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), got)
  }

  test("partial peel with rounds=1 keeps node 4 (deterministic prefix)") {
    val got = run(triChain, k = 2, rounds = 1)
    assert(got.keySet == Set(1L, 2L, 3L, 4L), got)
  }

  test("extra rounds past convergence are no-ops") {
    assert(run(triChain, k = 2, rounds = 3) == run(triChain, k = 2, rounds = 8))
  }

  test("3-core of K4 is K4 itself; 4-core is empty") {
    val k4 = for {
      a <- 1L to 4L; b <- 1L to 4L if a < b
    } yield a -> b
    assert(run(k4, k = 3, rounds = 2) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(run(k4, k = 4, rounds = 2).isEmpty)
  }

  test("edges symmetrize and dedupe: directed duplicates count once") {
    val dup = triChain ++ triChain.map { case (a, b) => (b, a) } ++ triChain
    assert(run(dup, k = 2, rounds = 3) == run(triChain, k = 2, rounds = 3))
  }
}
