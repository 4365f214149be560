package graft

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Property tests over random graphs/series for the round-4f operator
  * additions, each checked against an independent driver-side brute
  * force:
  *  1. KCore.kcore == sequential peel-to-fixpoint;
  *  2. clusteringCoefficient == brute per-node triangle/degree count;
  *  3. LabelProp == synchronous driver-side vote simulation;
  *  4. InterpJoin == brute bracketing scan;
  *  5. SortedNeighborhood == brute rank-window pairs.
  */
class GraphPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-graphprop-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def checkProp(p: Prop, n: Int = 12): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private def randomEdges(seed: Long): Seq[(Long, Long)] = {
    val rng = new Random(seed)
    val n = 6 + rng.nextInt(12)
    val m = n + rng.nextInt(2 * n)
    (0 until m).map(_ => (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
  }

  /** Undirected simple adjacency (self-loops dropped). */
  private def adj(edges: Seq[(Long, Long)]): Map[Long, Set[Long]] = {
    val sym = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .filter { case (a, b) => a != b }.distinct
    sym.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
  }

  test("k-core equals the sequential peel fixpoint on random graphs") {
    import spark.implicits._
    checkProp(Prop.forAll(Gen.choose(0L, 5000L), Gen.choose(2, 4)) { (seed, k) =>
      val edges = randomEdges(seed)
      // brute: peel to fixpoint on the symmetrized simple graph
      // (KCore keeps self-loops counting once; drop them from the
      // input instead so both sides agree on the graph)
      val simple = edges.filter { case (a, b) => a != b }
      var a = adj(simple)
      var changed = true
      while (changed) {
        val drop = a.collect { case (v, ns) if ns.size < k => v }.toSet
        changed = drop.nonEmpty
        if (changed)
          a = (a -- drop).view.mapValues(_ -- drop).filter(_._2.nonEmpty).toMap
      }
      val want = a.view.mapValues(_.size.toLong).toMap
      val got = graft.operators.KCore.kcore(
          simple.toDF("src", "dst"), "src", "dst", k = k, rounds = 20)
        .as[(Long, Long)].collect().toMap
      got == want
    })
  }

  test("clustering coefficient equals brute triangle/degree counting") {
    import spark.implicits._
    checkProp(Prop.forAll(Gen.choose(0L, 5000L)) { seed =>
      val edges = randomEdges(seed).filter { case (a, b) => a != b }
      if (edges.isEmpty) true
      else {
        val a = adj(edges)
        val want = a.map { case (v, ns) =>
          val d = ns.size.toLong
          val t = ns.toSeq.combinations(2)
            .count { case Seq(x, y) => a(x).contains(y) }.toLong
          v -> ((d, t, if (d >= 2) 2.0 * t / (d * (d - 1)) else 0.0))
        }
        val got = graft.operators.Triangles.clusteringCoefficient(
            edges.toDF("src", "dst"), "src", "dst")
          .as[(Long, Long, Long, Double)].collect()
          .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
        got == want
      }
    })
  }

  test("label propagation equals the synchronous driver-side vote simulation") {
    import spark.implicits._
    checkProp(Prop.forAll(Gen.choose(0L, 5000L), Gen.choose(1, 4)) { (seed, rounds) =>
      val edges = randomEdges(seed)
      val a = adj(edges)
      if (a.isEmpty) true
      else {
        var labels = a.keys.map(v => v -> v).toMap
        for (_ <- 1 to rounds) {
          labels = a.map { case (v, ns) =>
            val votes = ns.toSeq.map(labels).groupBy(identity)
              .view.mapValues(_.size).toMap
            val best = votes.toSeq.minBy { case (l, c) => (-c, l) }._1
            v -> best
          }
        }
        val got = graft.operators.LabelProp.propagate(
            edges.toDF("src", "dst"), "src", "dst", rounds)
          .as[(Long, Long)].collect().toMap
        got == labels
      }
    })
  }

  test("interpolation join equals the brute bracketing scan") {
    import spark.implicits._
    checkProp(Prop.forAll(Gen.choose(0L, 5000L)) { seed =>
      val rng = new Random(seed)
      def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
      val series = (0 until 8).map(i =>
        (rng.nextInt(3).toLong, ts(rng.nextInt(100).toLong),
          rng.nextInt(1000) / 10.0, (100 + i).toLong))
      val queries = (0 until 10).map(i =>
        (rng.nextInt(3).toLong, ts(rng.nextInt(120).toLong), 0.0,
          (200 + i).toLong))
      val got = graft.operators.InterpJoin.interpolate(
          series.toDF("k", "ts", "v", "id"),
          queries.toDF("k", "ts", "v", "id"), "k", "ts", "v", "id")
        .collect()
        .map(r => r.getLong(1) ->
          (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
      val bySer = series.groupBy(_._1).view
        .mapValues(_.map(s => (s._2.getTime / 1000, s._3, s._4))
          .sortBy(s => (s._1, s._3))).toMap
      val want = queries.map { case (k, qts, _, qid) =>
        val q = qts.getTime / 1000
        val s = bySer.getOrElse(k, Seq.empty)
        val prev = s.filter(_._1 <= q).lastOption
        qid -> (prev match {
          case Some((pt, pv, _)) if pt == q => Some(pv)
          case Some((pt, pv, _)) =>
            s.find(_._1 > q).map { case (nt, nv, _) =>
              pv + (nv - pv) * ((q - pt).toDouble / (nt - pt).toDouble)
            }
          case None => None
        })
      }.toMap
      got == want
    })
  }

  test("sorted-neighborhood equals the brute rank-window self-join") {
    import spark.implicits._
    checkProp(Prop.forAll(Gen.choose(0L, 5000L), Gen.choose(2, 6)) { (seed, w) =>
      val rng = new Random(seed)
      val rows = (0 until (5 + rng.nextInt(40)))
        .map(i => (i.toLong, rng.nextInt(20).toDouble))
      val ranked = rows.sortBy { case (id, v) => (v, id) }.zipWithIndex
        .map { case ((id, _), r) => (id, r + 1) }
      val want = (for {
        (ia, ra) <- ranked; (ib, rb) <- ranked
        if rb > ra && rb - ra <= w - 1
      } yield (ia, ib, (rb - ra).toLong)).toSet
      val got = graft.operators.SortedNeighborhood.candidatePairs(
          rows.toDF("id", "v"), "id", "v", w, bandWidth = 3.0)
        .as[(Long, Long, Long)].collect().toSet
      got == want
    })
  }
}
