package graft

import graft.geom.Geom
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed fixtures exercising every geometry algorithm and the
  * SURVEY.md §2.8 quirks. Expected values derived by hand from the
  * reference semantics (box/box.go, extract.go), not by running any code.
  */
class GeomSpec extends AnyFunSuite {

  private def w(t: String, x0: Double, x1: Double, y0: Double, y1: Double) =
    WordBox(t, x0, x1, y0, y1)

  // A clean 2x3 grid:
  //   col x-extents: [0.10,0.20], [0.40,0.50], [0.70,0.80]
  //   row y-bands:   [0.10,0.15], [0.30,0.35]
  val grid2x3: Seq[WordBox] = Seq(
    w("a1", 0.10, 0.20, 0.10, 0.15),
    w("b1", 0.40, 0.50, 0.10, 0.15),
    w("c1", 0.70, 0.80, 0.10, 0.15),
    w("a2", 0.10, 0.20, 0.30, 0.35),
    w("b2", 0.40, 0.50, 0.30, 0.35),
    w("c2", 0.70, 0.80, 0.30, 0.35)
  )

  test("intervalUnion merges touching and overlapping, sorts ascending") {
    val got = Geom.intervalUnion(Seq(
      Region(0.4, 0.5), Region(0.1, 0.2), Region(0.2, 0.25), // touching merges
      Region(0.45, 0.6), Region(0.9, 0.95)))
    assert(got == Vector(Region(0.1, 0.25), Region(0.4, 0.6), Region(0.9, 0.95)))
  }

  test("intervalUnion of nested and duplicate intervals") {
    val got = Geom.intervalUnion(Seq(
      Region(0.1, 0.9), Region(0.2, 0.3), Region(0.1, 0.9)))
    assert(got == Vector(Region(0.1, 0.9)))
    assert(Geom.intervalUnion(Nil) == Vector.empty)
  }

  test("xRegions / yRegions on the 2x3 grid") {
    assert(Geom.xRegions(grid2x3) ==
      Vector(Region(0.10, 0.20), Region(0.40, 0.50), Region(0.70, 0.80)))
    assert(Geom.yRegions(grid2x3) ==
      Vector(Region(0.10, 0.15), Region(0.30, 0.35)))
  }

  test("toTable (E1) recovers the 2x3 grid row-major regardless of input order") {
    val expected = Vector(Vector("a1", "b1", "c1"), Vector("a2", "b2", "c2"))
    assert(Geom.toTable(grid2x3) == expected)
    assert(Geom.toTable(new scala.util.Random(7).shuffle(grid2x3.toList)) == expected)
  }

  test("toTable: multi-word cells join in leftX order; empty cells are empty strings") {
    // "hello" [0.10,0.18] and "world" [0.17,0.30] x-overlap -> one column
    // region [0.10,0.30]; cell (row0,col1) is empty.
    val boxes = Seq(
      w("top", 0.10, 0.18, 0.10, 0.15),
      w("hello", 0.10, 0.18, 0.30, 0.35),
      w("world", 0.17, 0.30, 0.30, 0.35),
      w("right", 0.60, 0.70, 0.30, 0.35)
    )
    assert(Geom.toTable(boxes) ==
      Vector(Vector("top", ""), Vector("hello world", "right")))
  }

  test("toTable handles empty-text words like the reference's Trim") {
    val boxes = Seq(
      w("a", 0.10, 0.14, 0.10, 0.15),
      w("", 0.15, 0.16, 0.10, 0.15), // same x-region (touching at 0.14? no: overlap via union [0.10,0.16]? they don't touch)
      w("b", 0.17, 0.20, 0.10, 0.15)
    )
    // x-intervals [0.10,0.14],[0.15,0.16],[0.17,0.20] are disjoint -> 3 cols
    assert(Geom.toTable(boxes) == Vector(Vector("a", "", "b")))
    // overlapping variant -> one col, text "a b" (empty word collapses)
    val boxes2 = Seq(
      w("a", 0.10, 0.15, 0.10, 0.15),
      w("", 0.14, 0.16, 0.10, 0.15),
      w("b", 0.15, 0.20, 0.10, 0.15)
    )
    assert(Geom.toTable(boxes2) == Vector(Vector("a b")))
  }

  test("toTable of empty input is empty") {
    assert(Geom.toTable(Nil) == Vector.empty)
  }

  test("findSplits (W1): gap midpoints ascending, i=0 skipped") {
    // words sorted by leftX: [0.0,0.2], [0.3,0.4], [0.38,0.45], [0.7,0.8]
    // gaps: (0.2,0.3) -> mid 0.25 ; (0.45,0.7) -> mid 0.575
    val words = Seq(
      w("d", 0.7, 0.8, 0, 0.1),
      w("a", 0.0, 0.2, 0, 0.1),
      w("b", 0.3, 0.4, 0, 0.1),
      w("c", 0.38, 0.45, 0, 0.1)
    )
    val got = Geom.findSplits(words)
    assert(got.length == 2)
    assert(math.abs(got(0) - 0.25) < 1e-12)
    assert(math.abs(got(1) - 0.575) < 1e-12)
  }

  test("findSplits: leading gap from x=0 is skipped (i>0 guard)") {
    // first word starts at 0.5 > xRight=0, but i==0 so no gap emitted
    val words = Seq(w("a", 0.5, 0.6, 0, 0.1), w("b", 0.8, 0.9, 0, 0.1))
    val got = Geom.findSplits(words)
    assert(got.length == 1)
    assert(math.abs(got(0) - 0.7) < 1e-12)
  }

  test("findSplits on empty input is empty") {
    assert(Geom.findSplits(Nil) == Vector.empty)
  }

  test("splitRowBoxesEdge (W4): single-step bucket advance quirk") {
    // splits at 0.3 and 0.6; a word with leftX 0.65 past BOTH splits
    // still advances only one bucket from wherever the pointer is.
    val xs = Vector(0.3, 0.6)
    val a = w("a", 0.0, 0.1, 0, 1) // bucket 0
    val c = w("c", 0.65, 0.7, 0, 1) // pointer at 0: 0.65 > 0.3 -> bucket 1 (NOT 2)
    val got = Geom.splitRowBoxesEdge(Seq(c, a), xs)
    assert(got.map(_.map(_.text)) == Vector(Vector("a"), Vector("c"), Vector()))
    // with an intermediate word, c lands in bucket 2
    val b = w("b", 0.35, 0.4, 0, 1)
    val got2 = Geom.splitRowBoxesEdge(Seq(c, a, b), xs)
    assert(got2.map(_.map(_.text)) == Vector(Vector("a"), Vector("b"), Vector("c")))
  }

  test("splitRowBoxesMidpoint buckets by word midpoint") {
    val xs = Vector(0.5)
    // leftX 0.45 (edge would be bucket 0) but midpoint 0.55 > 0.5 -> bucket 1
    val a = w("a", 0.0, 0.2, 0, 1)
    val b = w("b", 0.45, 0.65, 0, 1)
    assert(Geom.splitRowBoxesMidpoint(Seq(a, b), xs).map(_.map(_.text)) ==
      Vector(Vector("a"), Vector("b")))
    assert(Geom.splitRowBoxesEdge(Seq(a, b), xs).map(_.map(_.text)) ==
      Vector(Vector("a", "b"), Vector()))
  }

  test("partitionIntoRows (W2): rows split on strictly-decreasing leftX") {
    val words = Seq(
      w("a1", 0.1, 0.2, 0.10, 0.15), w("b1", 0.4, 0.5, 0.10, 0.15),
      w("a2", 0.1, 0.2, 0.30, 0.35), w("b2", 0.4, 0.5, 0.30, 0.35)
    )
    val got = Geom.partitionIntoRows(new scala.util.Random(3).shuffle(words.toList))
    assert(got.map(_.map(_.text)) == Vector(Vector("a1", "b1"), Vector("a2", "b2")))
  }

  test("partitionIntoRows quirk: second word never opens a row (prevX=0 seed)") {
    // row 0 has ONE word at leftX 0.5; row 1 starts at leftX 0.1 < 0.5 —
    // but the second word compares against prevX=0, so it joins row 0.
    val words = Seq(
      w("only", 0.5, 0.6, 0.10, 0.15),
      w("below", 0.1, 0.2, 0.30, 0.35),
      w("next", 0.4, 0.5, 0.30, 0.35)
    )
    val got = Geom.partitionIntoRows(words)
    assert(got.map(_.map(_.text)) == Vector(Vector("only", "below", "next")))
  }

  test("partitionIntoRows of empty input returns Nil (documented divergence)") {
    assert(Geom.partitionIntoRows(Nil) == Vector.empty)
  }

  test("toTableSplitHeuristic (E2) on the 2x3 grid") {
    assert(Geom.toTableSplitHeuristic(grid2x3) ==
      Vector(Vector("a1", "b1", "c1"), Vector("a2", "b2", "c2")))
  }

  test("toTableSplitHeuristic: ragged rows get empty trailing cells") {
    // row 2 has no word in col 3 -> its bucket is empty -> ""
    val words = grid2x3.filterNot(_.text == "c2")
    assert(Geom.toTableSplitHeuristic(words) ==
      Vector(Vector("a1", "b1", "c1"), Vector("a2", "b2", "")))
  }

  test("cellsToTable (E3): dense 1-based grid, last duplicate wins") {
    val cells = Seq((2, 1, "x"), (1, 1, "a"), (1, 2, "b"), (2, 2, "y"), (2, 2, "z"))
    assert(Geom.cellsToTable(cells) ==
      Some(Vector(Vector("a", "b"), Vector("x", "z"))))
  }

  test("cellsToTable: ragged rows allowed (per-row contiguous cols)") {
    val cells = Seq((1, 1, "a"), (1, 2, "b"), (2, 1, "x"))
    assert(Geom.cellsToTable(cells) == Some(Vector(Vector("a", "b"), Vector("x"))))
  }

  test("cellsToTable rejects non-contiguous indices (reference would panic)") {
    assert(Geom.cellsToTable(Seq((1, 1, "a"), (3, 1, "c"))).isEmpty)
    assert(Geom.cellsToTable(Seq((1, 1, "a"), (1, 3, "c"))).isEmpty)
    assert(Geom.cellsToTable(Seq((2, 1, "a"))).isEmpty) // 0/2-based rejected
    assert(Geom.cellsToTable(Nil) == Some(Vector.empty))
  }

  test("rowOrdering: band-then-x, consistent with disjoint bands") {
    val top = w("t", 0.9, 1.0, 0.1, 0.2)
    val bottom = w("b", 0.0, 0.1, 0.5, 0.6)
    assert(Geom.rowOrdering.compare(top, bottom) < 0)
    assert(Geom.rowOrdering.compare(bottom, top) > 0)
    val sameBand = w("s", 0.5, 0.6, 0.12, 0.22) // y-overlaps `top`
    assert(Geom.rowOrdering.compare(sameBand, top) < 0) // 0.5 < 0.9
  }
}
