package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Label propagation: hand-computed synchronous vote rounds on tiny
  * graphs (clique convergence, disjoint communities, min-label
  * tie-break, self-loop/symmetrization hygiene) and the per-node
  * clustering coefficient's exact fractions.
  */
class LabelPropSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-labelprop-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def run(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    import spark.implicits._
    graft.operators.LabelProp.propagate(edges.toDF("src", "dst"), "src", "dst", rounds)
      .as[(Long, Long)].collect().toMap
  }

  test("K4 converges to the all-min label by round 2") {
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield a -> b
    assert(run(k4, rounds = 2) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("disjoint cliques settle on per-community min labels") {
    val c1 = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L)
    val c2 = Seq(10L -> 11L, 11L -> 12L, 10L -> 12L)
    val got = run(c1 ++ c2, rounds = 3)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L), got)
  }

  test("path 1-2-3 round 1 matches hand votes with min-label tie-break") {
    // node 1 hears {2}; node 2 hears {1,3} (tie -> 1); node 3 hears {2}
    val got = run(Seq(1L -> 2L, 2L -> 3L), rounds = 1)
    assert(got == Map(1L -> 2L, 2L -> 1L, 3L -> 2L), got)
  }

  test("self-loops and directed duplicates are normalized away") {
    val base = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L)
    val noisy = base ++ Seq(1L -> 1L, 2L -> 2L) ++ base.map { case (a, b) => (b, a) }
    assert(run(noisy, rounds = 2) == run(base, rounds = 2))
  }

  test("clustering coefficient: triangle + pendant exact fractions") {
    import spark.implicits._
    val edges = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 4L).toDF("src", "dst")
    val got = graft.operators.Triangles
      .clusteringCoefficient(edges, "src", "dst")
      .as[(Long, Long, Long, Double)].collect()
      .map { case (n, d, t, c) => n -> ((d, t, c)) }.toMap
    assert(got(1L) == ((2L, 1L, 1.0)))
    assert(got(2L) == ((2L, 1L, 1.0)))
    assert(got(3L) == ((3L, 1L, 1.0 / 3.0)))
    assert(got(4L) == ((1L, 0L, 0.0)))
  }

  test("clustering coefficient: K4 is fully clustered") {
    import spark.implicits._
    val k4 = (for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b))
      .toDF("src", "dst")
    val got = graft.operators.Triangles
      .clusteringCoefficient(k4, "src", "dst")
      .as[(Long, Long, Long, Double)].collect()
    assert(got.length == 4 && got.forall { case (_, d, t, c) =>
      d == 3L && t == 3L && c == 1.0 })
  }
}
