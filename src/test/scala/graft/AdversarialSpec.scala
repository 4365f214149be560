package graft

import graft.extract.Extract
import graft.fixtures.SpanGen
import graft.geom.Geom
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial strategy-divergence corpus: hand-computed goldens for
  * the scenario layouts (E1 vs E2 genuinely disagree inside the §2.8
  * validity envelope) plus corpus-level invariants. The driver-facing
  * counterpart is the extract_*_adv oracle trio in SparkEntry.
  */
class AdversarialSpec extends AnyFunSuite {

  // band j at y [0.05+0.2j, 0.15+0.2j]; island k slot s at
  // x [0.05+0.2k+0.05s, +0.05] — the adversarial generator's grid
  private def w(t: String, j: Int, k: Int, s: Int = 0): WordBox = {
    val x0 = 0.05 + 0.2 * k + 0.05 * s
    WordBox(t, x0, x0 + 0.05, 0.05 + 0.2 * j, 0.15 + 0.2 * j)
  }

  test("staircase-merge: E2 absorbs a high-x band into the previous row; E1 does not") {
    val boxes = Vector(
      w("a", 0, 0, 0), w("b", 0, 0, 1), w("c", 0, 1),
      w("d", 1, 2),
      w("e", 2, 0), w("f", 2, 1), w("g", 2, 2))
    assert(Geom.toTable(boxes) == Vector(
      Vector("a b", "c", ""),
      Vector("", "", "d"),
      Vector("e", "f", "g")))
    assert(Geom.toTableSplitHeuristic(boxes) == Vector(
      Vector("a b", "c", "d"),
      Vector("e", "f", "g")))
  }

  test("prevX=0 seeding quirk: a lone first-band word swallows the next band in E2") {
    val boxes = Vector(w("a", 0, 2), w("b", 1, 0), w("c", 1, 1))
    assert(Geom.toTable(boxes) == Vector(
      Vector("", "", "a"),
      Vector("b", "c", "")))
    // sorted by (band, leftX): a(0.45), b(0.05), c(0.25); b is the
    // second word overall and compares against prevX=0 -> no row break
    assert(Geom.toTableSplitHeuristic(boxes) == Vector(Vector("b", "c", "a")))
  }

  test("cross-band cell merge: one E2 cell concatenates words from two bands") {
    val boxes = Vector(w("a", 0, 0, 0), w("b", 0, 0, 1), w("c", 0, 1, 0), w("d", 1, 1, 1))
    assert(Geom.toTable(boxes) == Vector(
      Vector("a b", "c"),
      Vector("", "d")))
    assert(Geom.toTableSplitHeuristic(boxes) == Vector(Vector("a b", "c d")))
  }

  test("adversarial corpus: deterministic, diverges E1 vs E2, E2 == E2mid everywhere") {
    val docs = (0L until 200L).map(SpanGen.adversarialDoc(_))
    assert(docs(5) == SpanGen.adversarialDoc(5L))
    val e1 = docs.map(Extract.extractDoc(_, Extract.Strategy.RegionClustering))
    val e2 = docs.map(Extract.extractDoc(_, Extract.Strategy.SplitHeuristic))
    val e2m = docs.map(Extract.extractDoc(_, Extract.Strategy.SplitMidpoint))
    assert(e1.forall(_.status == "ok") && e2.forall(_.status == "ok"))
    val diverging = e1.zip(e2).count { case (a, b) => a.spans != b.spans }
    assert(diverging > 50, s"corpus must make E1 and E2 disagree often (got $diverging/200)")
    assert(e2.zip(e2m).forall { case (a, b) => a == b },
      "edge and midpoint bucketing are provably identical through the pipeline")
  }
}
