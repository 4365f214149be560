package graft.geom

import graft.{Region, WordBox}

import scala.collection.mutable.ArrayBuffer

/** Pure geometry core: faithful re-derivations of the reference's five
  * table-structure-recovery algorithms (see SURVEY.md §2.4-2.7), written
  * as side-effect-free Scala functions so they can run inside typed
  * Dataset map stages with no shuffle.
  *
  * Semantics notes (SURVEY.md §2.8):
  *  - Region clustering (reference XRegions/YRegions + mergeRegions,
  *    box/box.go:53-142) is implemented as the true closed-interval union
  *    via an O(n log n) sort-sweep. For valid inputs (no partially-chained
  *    overlaps dependent on insertion order) this equals the reference's
  *    order-dependent O(n²) accretion; fixtures are generated to satisfy
  *    that (FIXTURES.md §2).
  *  - The row comparator (extract.go:27-49, box/box.go:212-227) is only a
  *    total order when row y-bands are pairwise disjoint (the reference's
  *    own stated assumption, extract.go:119-120).
  *  - Quirks replicated verbatim: single-step bucket advance in
  *    splitRowBoxes (extract.go:109-115), prevX=0 seeding in
  *    partitionIntoRows (extract.go:126-140), trim+space-join cell text in
  *    global row-band/leftX word order (box/box.go:236-243).
  *  - Divergence: partitionIntoRows([]) returns Nil instead of panicking
  *    (reference extract.go:127 indexes words[0]); empty-word docs pass
  *    through the pipeline unchanged.
  */
object Geom {

  /** Row-band ordering: a before b when a's band is strictly above b's
    * (a.bottomY < b.topY); after when strictly below; otherwise same band,
    * order by leftX. Faithful to extract.go:35-49. Total order only when
    * bands are pairwise disjoint.
    */
  val rowOrdering: Ordering[WordBox] = new Ordering[WordBox] {
    def compare(a: WordBox, b: WordBox): Int =
      if (a.bottomY < b.topY) -1
      else if (a.topY > b.bottomY) 1
      else java.lang.Double.compare(a.leftX, b.leftX)
  }

  val byLeftX: Ordering[WordBox] = Ordering.by(_.leftX)

  /** Closed-interval union: sorted, non-overlapping regions covering all
    * inputs. Touching intervals merge (the reference's overlap predicates
    * box/box.go:26-49 use <=/>=). O(n log n).
    */
  def intervalUnion(intervals: collection.Seq[Region]): Vector[Region] = {
    if (intervals.isEmpty) return Vector.empty
    val sorted = intervals.sortBy(r => (r.start, r.end))
    val out = new ArrayBuffer[Region](sorted.length)
    var cur = sorted.head
    for (r <- sorted.tail) {
      if (r.start <= cur.end) {
        if (r.end > cur.end) cur = Region(cur.start, r.end)
      } else {
        out += cur
        cur = r
      }
    }
    out += cur
    out.toVector
  }

  /** Column regions: x-interval union over word boxes (box/box.go:53-72). */
  def xRegions(boxes: collection.Seq[WordBox]): Vector[Region] =
    intervalUnion(boxes.map(b => Region(b.leftX, b.rightX)))

  /** Row regions: y-interval union over word boxes (box/box.go:76-100). */
  def yRegions(boxes: collection.Seq[WordBox]): Vector[Region] =
    intervalUnion(boxes.map(b => Region(b.topY, b.bottomY)))

  /** Index of the unique region fully containing [lo, hi], or -1.
    * Regions must be sorted and non-overlapping. Binary search: rightmost
    * region with start <= lo, then containment check.
    */
  def regionIndexOf(regions: IndexedSeq[Region], lo: Double, hi: Double): Int = {
    var a = 0
    var b = regions.length - 1
    var ans = -1
    while (a <= b) {
      val m = (a + b) >>> 1
      if (regions(m).start <= lo) { ans = m; a = m + 1 }
      else b = m - 1
    }
    if (ans >= 0 && regions(ans).end >= hi) ans else -1
  }

  /** E1 core (box.ToTable, box/box.go:250-280): cluster word boxes into
    * column x-regions and row y-regions, build the dense grid, and fill
    * each cell with the space-joined text of the words it contains, in
    * global (row-band, leftX) word order, trimmed (box/box.go:229-246).
    * Rows ascend in y, columns ascend in x (the reference's final
    * RowsOfBoxes sort, box/box.go:265-267, on already-ascending regions).
    *
    * O(n log n): one global sort + binary-searched region assignment,
    * replacing the reference's O(cells·n log n) per-cell rescans —
    * identical output for valid inputs.
    */
  /** strings.Trim(s, " ") — trims ASCII space only, unlike String.trim. */
  private def trimSpaces(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    s.substring(a, b)
  }

  def toTable(boxes: collection.Seq[WordBox]): Vector[Vector[String]] = {
    if (boxes.isEmpty) return Vector.empty
    val xs = xRegions(boxes)
    val ys = yRegions(boxes)
    val cells = Array.fill(ys.length, xs.length)("")
    // Assign each box to its (yRegion, xRegion) cell, then order by
    // (row band, leftX). For valid inputs this equals the reference's
    // Boxes sort (band == y-region when bands are disjoint), and unlike
    // the raw comparator it is a total order — TimSort cannot throw
    // "Comparison method violates its general contract" on pathological
    // overlap patterns, which matters when one bad doc must not kill a
    // 1000-executor job.
    val assigned = boxes.iterator.map { b =>
      val ci = regionIndexOf(xs, b.leftX, b.rightX)
      val ri = regionIndexOf(ys, b.topY, b.bottomY)
      (ri, ci, b)
    }.toArray
    // Both indices always >= 0: regions are unions of the box extents,
    // so every box lies wholly inside exactly one region per axis.
    java.util.Arrays.sort(assigned, Ordering.by[(Int, Int, WordBox), (Int, Double)] {
      case (ri, _, b) => (ri, b.leftX)
    })
    for ((ri, ci, b) <- assigned if ri >= 0 && ci >= 0)
      // per-append space-join + trim, verbatim box/box.go:241
      cells(ri)(ci) = trimSpaces(cells(ri)(ci) + " " + b.text)
    cells.map(_.toVector).toVector
  }

  /** W1 (FindSplits, extract.go:65-88): sort words by leftX, sweep a
    * running max of rightX; a gap opens where the next word's leftX
    * exceeds the running max (skipping i=0). Emits gap midpoints sorted
    * ascending (the intermediate by-size sort at extract.go:78 is erased
    * by the ascending sort at :86).
    */
  def findSplits(words: collection.Seq[WordBox]): Vector[Double] = {
    val sorted = words.sorted(byLeftX)
    val mids = new ArrayBuffer[Double]
    var xRight = 0.0
    var i = 0
    for (w <- sorted) {
      if (w.leftX > xRight && i > 0) mids += xRight + (w.leftX - xRight) / 2
      if (w.rightX > xRight) xRight = w.rightX
      i += 1
    }
    mids.sortInPlace()
    mids.toVector
  }

  /** W4 (SplitRowBoxesFunc, extract.go:102-117): distribute leftX-sorted
    * words into len(xs)+1 buckets with a single forward pointer that
    * advances AT MOST ONE split per word (verbatim quirk: a word past
    * several splits still moves only one bucket).
    */
  def splitRowBoxesFunc(
      words: collection.Seq[WordBox],
      xs: IndexedSeq[Double],
      f: WordBox => Double): Vector[Vector[WordBox]] = {
    val sorted = words.sorted(byLeftX)
    val buckets = Vector.fill(xs.length + 1)(new ArrayBuffer[WordBox])
    var i = 0
    for (w <- sorted) {
      if (i < xs.length && f(w) > xs(i)) i += 1
      buckets(i) += w
    }
    buckets.map(_.toVector)
  }

  /** extract.go:96-100 — bucket by left edge. */
  def splitRowBoxesEdge(words: collection.Seq[WordBox], xs: IndexedSeq[Double]): Vector[Vector[WordBox]] =
    splitRowBoxesFunc(words, xs, _.leftX)

  /** extract.go:90-94 — bucket by midpoint. */
  def splitRowBoxesMidpoint(words: collection.Seq[WordBox], xs: IndexedSeq[Double]): Vector[Vector[WordBox]] =
    splitRowBoxesFunc(words, xs, w => w.leftX + (w.rightX - w.leftX) / 2)

  /** W2 (PartitionIntoRows, extract.go:121-142): sort by row order; first
    * word seeds row 0; a new row starts when leftX strictly decreases vs
    * the previous word. prevX is seeded to 0, so the second word can never
    * open a new row (verbatim quirk — fixtures give the first row ≥2
    * words). Divergence: empty input returns Nil (reference panics).
    */
  def partitionIntoRows(words: collection.Seq[WordBox]): Vector[Vector[WordBox]] = {
    if (words.isEmpty) return Vector.empty
    val sorted = words.sorted(rowOrdering)
    val rows = new ArrayBuffer[ArrayBuffer[WordBox]]
    rows += ArrayBuffer(sorted.head)
    var i = 0
    var prevX = 0.0
    for (w <- sorted.tail) {
      if (w.leftX < prevX) {
        i += 1
        rows += new ArrayBuffer[WordBox]
      }
      rows(i) += w
      prevX = w.leftX
    }
    rows.map(_.toVector).toVector
  }

  /** E2 (ToTableWithSplitHeuristic, textract/textract.go:214-265): rows by
    * leftX-decrease segmentation, columns by global gap splits, each row's
    * words bucketed by left edge, cell text = trimmed space-join.
    * Every row has findSplits(words).length + 1 cells.
    */
  def toTableSplitHeuristic(words: collection.Seq[WordBox]): Vector[Vector[String]] =
    toTableSplitWith(words, splitRowBoxesEdge)

  /** E2 with midpoint bucketing (SplitRowBoxesMidpoint,
    * extract.go:90-94 — an exposed reference API the live path never
    * calls) — identical to the edge variant except each word buckets by
    * its x midpoint.
    */
  def toTableSplitHeuristicMidpoint(words: collection.Seq[WordBox]): Vector[Vector[String]] =
    toTableSplitWith(words, splitRowBoxesMidpoint)

  private def toTableSplitWith(
      words: collection.Seq[WordBox],
      split: (collection.Seq[WordBox], IndexedSeq[Double]) => Vector[Vector[WordBox]])
      : Vector[Vector[String]] = {
    if (words.isEmpty) return Vector.empty
    val rows = partitionIntoRows(words)
    val splitAt = findSplits(words)
    rows.map { rowWords =>
      split(rowWords, splitAt)
        .map(cell => cell.map(_.text).mkString(" ").trim)
    }
  }

  /** E3 (ToTableFromDetectedTable, textract/textract.go:121-175): assemble
    * a table from pre-structured (row, col, text) cells with 1-based
    * indices. The reference assumes row indices are exactly 1..R and each
    * row's col indices exactly 1..C_r (panics otherwise,
    * textract/textract.go:158-173); we validate and return None instead.
    * Duplicate (row, col) keeps the last occurrence (Go map overwrite).
    */
  def cellsToTable(cells: collection.Seq[(Int, Int, String)]): Option[Vector[Vector[String]]] = {
    if (cells.isEmpty) return Some(Vector.empty)
    val rowMap = scala.collection.mutable.LinkedHashMap[Int, scala.collection.mutable.LinkedHashMap[Int, String]]()
    for ((r, c, t) <- cells)
      rowMap.getOrElseUpdate(r, scala.collection.mutable.LinkedHashMap[Int, String]()).update(c, t)
    val rowIdx = rowMap.keys.toVector.sorted
    if (rowIdx != (1 to rowIdx.length).toVector) return None
    val out = Vector.newBuilder[Vector[String]]
    for (r <- rowIdx) {
      val row = rowMap(r)
      val colIdx = row.keys.toVector.sorted
      if (colIdx != (1 to colIdx.length).toVector) return None
      out += colIdx.map(row)
    }
    Some(out.result())
  }
}
