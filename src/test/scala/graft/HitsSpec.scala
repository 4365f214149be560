package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HITS hubs/authorities: hand-computed one-iteration scores on a tiny
  * graph (exact doubles — the quantized-integer arithmetic is fully
  * deterministic), zero-score edges cases, L1 invariants, and
  * duplicate-edge idempotence.
  */
class HitsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-hits-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, (Double, Double)] = {
    import spark.implicits._
    graft.operators.Hits.hits(edges.toDF("src", "dst"), "src", "dst", iters)
      .as[(Long, Double, Double)].collect()
      .map { case (n, h, a) => n -> (h, a) }.toMap
  }

  test("one iteration on 1->3, 2->3, 3->4 matches hand arithmetic") {
    val got = run(Seq(1L -> 3L, 2L -> 3L, 3L -> 4L), iters = 1)
    // a_raw: n3 = 2e12, n4 = 1e12; total 3e12
    val a3 = 2000000000000L.toDouble / 3000000000000L.toDouble
    val a4 = 1000000000000L.toDouble / 3000000000000L.toDouble
    // h_raw: n1 = n2 = floor(a3*1e12), n3 = floor(a4*1e12)
    val h12 = math.floor(a3 * 1e12).toLong
    val h3 = math.floor(a4 * 1e12).toLong
    val tot = (2 * h12 + h3).toDouble
    assert(got(3L) == (h3.toDouble / tot, a3))
    assert(got(1L) == (h12.toDouble / tot, 0.0))
    assert(got(2L) == (h12.toDouble / tot, 0.0))
    assert(got(4L) == (0.0, a4))
  }

  test("L1 invariants: hubs and auths each sum to ~1, all nonnegative") {
    val edges = for (i <- 0L until 40L) yield i -> ((i * 7 + 3) % 40)
    val got = run(edges, iters = 3)
    val hs = got.values.map(_._1).sum
    val as = got.values.map(_._2).sum
    assert(math.abs(hs - 1.0) < 1e-9 && math.abs(as - 1.0) < 1e-9, (hs, as))
    assert(got.values.forall { case (h, a) => h >= 0.0 && a >= 0.0 })
  }

  test("duplicate edges count once") {
    val base = Seq(1L -> 3L, 2L -> 3L, 3L -> 4L)
    assert(run(base ++ base ++ base, iters = 2) == run(base, iters = 2))
  }

  test("hub-vs-authority separation: pointed-at node leads authority, pointers lead hub") {
    // star: 1..5 all point at 9; 9 points at 1
    val got = run((1L to 5L).map(_ -> 9L) :+ (9L -> 1L), iters = 3)
    assert(got(9L)._2 > got(1L)._2, got)
    assert(got(1L)._1 > got(9L)._1, got)
    assert(got(9L)._1 > 0.0) // 9 -> 1 makes 9 a (weak) hub too
  }
}
