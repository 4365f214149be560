package graft.fixtures

import graft._

import org.apache.spark.sql.{Dataset, SparkSession}

import scala.collection.mutable.ArrayBuffer
import scala.util.Random

/** Deterministic, seeded generator for the interleaved span-table input
  * (BASELINE.json `input_hint`) and its golden outputs.
  *
  * The goldens are derived from the generator's own grid knowledge —
  * never by running the extraction code — so golden tests are
  * non-tautological: a table spec says which (row, col) cells hold which
  * words; the expected output is that grid serialized row-major over the
  * occupied rows x occupied columns; the generated word boxes are laid
  * out so the reference semantics unambiguously recover exactly that
  * grid (FIXTURES.md §2 validity constraints: pairwise-disjoint row
  * bands, chained within-column x-intervals, clean inter-column gaps).
  */
object SpanGen {

  val Vocab: Vector[String] = Vector(
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
    "victor", "whiskey", "xray", "yankee", "zulu", "amber", "basalt",
    "cobalt", "dune", "ember", "fjord", "garnet", "harbor", "isle",
    "jade", "krill", "lumen", "maple", "nectar", "onyx", "prism",
    "quartz", "raven", "slate", "topaz", "umber", "vortex", "willow",
    "zephyr")

  /** A table spec: cells(r)(c) = slot words (possibly empty = empty cell);
    * slots fill consecutively from 0.
    */
  final case class TableSpec(rows: Int, cols: Int, cells: Map[(Int, Int), Vector[String]]) {
    def occupiedRows: Vector[Int] =
      (0 until rows).filter(r => (0 until cols).exists(c => cells.getOrElse((r, c), Vector.empty).nonEmpty)).toVector
    def occupiedCols: Vector[Int] =
      (0 until cols).filter(c => (0 until rows).exists(r => cells.getOrElse((r, c), Vector.empty).nonEmpty)).toVector

    /** The golden table: occupied rows x occupied cols, slot words joined. */
    def expectedTable: Vector[Vector[String]] =
      occupiedRows.map(r => occupiedCols.map(c =>
        cells.getOrElse((r, c), Vector.empty).mkString(" ")))
  }

  val MaxSlots = 2

  /** Lay a spec out as word_box spans. Geometry invariants:
    *  - column c occupies x in [colLeft, colLeft + usedSlots*slotPitch],
    *    slot intervals touch (closed intervals chain into one region);
    *  - inter-column gap is 0.4*colPitch > 0, so columns never merge;
    *  - row r's band is [rowTop, rowTop + 0.5*rowPitch] with per-word
    *    jitter <= 0.1*rowPitch, bands pairwise disjoint.
    * Span emission order is shuffled (structure recovery must not depend
    * on input order); offsets are assigned by the caller.
    */
  def layoutSpans(spec: TableSpec, rng: Random): Vector[(String, String)] = {
    val colPitch = 0.9 / spec.cols
    val rowPitch = 0.9 / spec.rows
    val slotPitch = colPitch * 0.3
    val words = new ArrayBuffer[(String, String)]
    for (r <- 0 until spec.rows; c <- 0 until spec.cols) {
      val slots = spec.cells.getOrElse((r, c), Vector.empty)
      val colLeft = 0.05 + c * colPitch
      val rowTop = 0.05 + r * rowPitch
      for ((w, j) <- slots.zipWithIndex) {
        val x0 = colLeft + j * slotPitch
        val x1 = colLeft + (j + 1) * slotPitch
        val jt = rng.nextDouble() * 0.1 * rowPitch
        val jb = rng.nextDouble() * 0.1 * rowPitch
        val y0 = rowTop + jt
        val y1 = rowTop + 0.5 * rowPitch - jb
        words += ((w, f"$x0%.6f,$x1%.6f,$y0%.6f,$y1%.6f"))
      }
    }
    rng.shuffle(words.toVector)
  }

  private def randSpec(rng: Random, dense: Boolean): TableSpec = {
    val rows = 2 + rng.nextInt(5) // 2..6
    val cols = 2 + rng.nextInt(4) // 2..5
    val cells = for {
      r <- 0 until rows
      c <- 0 until cols
      nWords = if (dense) 1 + rng.nextInt(MaxSlots)
               else if (rng.nextDouble() < 0.15) 0
               else 1 + rng.nextInt(MaxSlots)
      if nWords > 0
    } yield (r, c) -> Vector.fill(nWords)(Vocab(rng.nextInt(Vocab.length)))
    val m = cells.toMap
    // guarantee at least one occupied cell so the run emits a table
    if (m.isEmpty) TableSpec(rows, cols, Map((0, 0) -> Vector(Vocab(rng.nextInt(Vocab.length)))))
    else TableSpec(rows, cols, m)
  }

  private def randWords(rng: Random, lo: Int, hi: Int): String =
    Vector.fill(lo + rng.nextInt(hi - lo + 1))(Vocab(rng.nextInt(Vocab.length))).mkString(" ")

  /** One seeded doc + its golden output span sequence. */
  def genDoc(docId: Long, seed: Long): (Doc, Vector[Span]) = {
    val rng = new Random(seed * 1000003L + docId * 7919L)
    val in = new ArrayBuffer[(String, String, String)]
    val gold = new ArrayBuffer[(String, String, String)]

    def addText(): Unit = {
      val t = randWords(rng, 2, 6)
      in += ((SpanKinds.Text, t, ""))
      gold += ((SpanKinds.Text, t, ""))
    }
    def addMedia(k: Int): Unit = {
      val ref = s"media://$docId/$k"
      in += ((SpanKinds.Media, "", ref))
      gold += ((SpanKinds.Media, "", ref))
    }
    def addHtml(): Unit = {
      val content = randWords(rng, 3, 8)
      val nav = randWords(rng, 1, 2)
      in += ((SpanKinds.Html,
        s"<div><p>$content</p><a href=\"#\">$nav</a></div>", ""))
      gold += ((SpanKinds.Text, content, ""))
    }
    def addGold(table: Vector[Vector[String]]): Unit =
      for (r <- table.indices; c <- table(r).indices)
        gold += ((SpanKinds.Cell, table(r)(c), s"${r + 1},${c + 1}"))
    def addWordBoxTable(): Unit = {
      val spec = randSpec(rng, dense = false)
      layoutSpans(spec, rng).foreach { case (w, ref) =>
        in += ((SpanKinds.WordBox, w, ref))
      }
      addGold(spec.expectedTable)
    }
    def addCellTable(): Unit = {
      val spec = randSpec(rng, dense = true)
      val cells = for {
        r <- 0 until spec.rows; c <- 0 until spec.cols
      } yield (SpanKinds.Cell, spec.cells((r, c)).mkString(" "), s"${r + 1},${c + 1}")
      rng.shuffle(cells.toVector).foreach(in += _)
      addGold(spec.expectedTable)
    }

    addText()
    val nGroups = 2 + rng.nextInt(4)
    for (_ <- 0 until nGroups) {
      rng.nextInt(5) match {
        case 0 => addText()
        case 1 => addMedia(in.length)
        case 2 => addHtml()
        case 3 => addWordBoxTable()
        case 4 => addCellTable()
      }
      // separator so adjacent table groups don't fuse into one run
      addText()
    }
    addWordBoxTable()
    addMedia(in.length)

    val doc = Doc(s"doc-$docId",
      in.iterator.zipWithIndex.map { case ((k, t, m), i) => Span(k, t, m, i) }.toVector)
    val golden =
      gold.iterator.zipWithIndex.map { case ((k, t, m), i) => Span(k, t, m, i) }.toVector
    (doc, golden)
  }

  def genDocs(n: Int, seed: Long): Vector[(Doc, Vector[Span])] =
    (0L until n.toLong).map(genDoc(_, seed)).toVector

  /** Bench/verify-scale input: one synthesized doc per row of the
    * driver's documents.parquet, deterministic in (doc_id, text) alone —
    * identical output at any parallelism. Table shapes and word
    * placement are seeded by doc_id; words come from the document text.
    */
  def fromDocuments(
      spark: SparkSession,
      sfDir: String,
      seed: Long = 42L,
      replicate: Int = 1): Dataset[Doc] = {
    import spark.implicits._
    // per-row synthesis is CPU-heavy and deterministic in (doc_id, text)
    // alone, so spreading an under-split scan is placement-only; factor
    // 4 matches Extract.distributed's oversubscription so the extractor
    // elides its own exchange instead of re-shuffling this one
    val docs = graft.Parallelize.bySplits(
        spark.read.parquet(s"$sfDir/documents.parquet")
          .select("doc_id", "text"), "doc_id", factor = 4)
      .as[(Long, String)]
    if (replicate <= 1) docs.map { case (id, text) => synthDoc(id, text, seed) }
    else docs.flatMap { case (id, text) =>
      // deterministic fan-out for bench-scale corpora: each replica is a
      // distinct doc with its own seeded geometry
      (0 until replicate).iterator.map(k => synthDoc(id * replicate + k, text, seed))
    }
  }

  // ------------------------------------------------------------------
  // Adversarial verification corpus: layouts INSIDE the §2.8 validity
  // envelope (pairwise-disjoint y-bands, chained within-island
  // x-intervals, clean gaps, no leftX ties within a band) but where E1
  // (region clustering) and E2 (split heuristic) genuinely DISAGREE —
  // so strategy differences are driver-oracled, not only golden-gated.
  //
  // The divergence axis is row structure: E1 rows are y-interval
  // islands; E2 rows come from leftX-decrease segmentation
  // (extract.go:121-142), which merges a band into the previous row
  // whenever its first word starts at x >= the previous word's leftX —
  // including via the verbatim prevX=0 seeding quirk (the second word
  // overall can never open a row). Column structure intentionally
  // CANNOT diverge between E2's edge and midpoint bucketing through the
  // composed pipeline: FindSplits gaps are x-regions no word's extent
  // touches (every earlier word in x-order ends at or before the
  // running max, every later one starts at or after the gap end), so a
  // word's left edge and midpoint always fall on the same side of every
  // split — proven as a ScalaCheck property in GeomPropertySpec. The
  // variants differ only via the raw splitRowBoxes* APIs with arbitrary
  // splits (unit-gated in GeomSpec).
  //
  // SQL-expressibility constraint (documented, not silent): within each
  // E2 row, words in leftX order step through x-islands by at most one
  // island at a time and the first word sits in island 0 or 1 — under
  // that constraint the reference's one-step pointer bucketing
  // (extract.go:109-115) equals count-of-splits-passed, which a window
  // expression can replay. The one-step-advance quirk itself stays
  // unit-gated (GeomSpec) since it requires a sequential recurrence.
  // ------------------------------------------------------------------

  private final case class AdvWord(j: Int, k: Int, s: Int) // band, island, slot

  /** Scenario word sets as (band, island, slot) triples; islands are at
    * x [0.05+0.2k, 0.05+0.2k+2*0.05] (two touching slots of 0.05), bands
    * at y [0.05+0.2j, 0.15+0.2j] with per-word jitter < 0.02.
    */
  private def advScenario(rng: Random): Vector[AdvWord] = rng.nextInt(5) match {
    case 0 =>
      // staircase-merge: band1's lone high-x word continues band0's row
      // under E2 (no leftX decrease); E1 keeps three band-rows.
      // E1: 3x3 [[a b, c, ''], ['', '', d], [e, f, g]]
      // E2: 2x3 [[a b, c, d], [e, f, g]]
      Vector(AdvWord(0, 0, 0), AdvWord(0, 0, 1), AdvWord(0, 1, 0),
        AdvWord(1, 2, 0), AdvWord(2, 0, 0), AdvWord(2, 1, 0), AdvWord(2, 2, 0))
    case 1 =>
      // prevX=0 seeding quirk: band0 is a single high-x word, so the
      // second word overall (band1, island 0) compares against prevX=0
      // and can NOT open a row — E2 collapses both bands into one row,
      // scrambling reading order; E1 keeps two band-rows.
      // E1: 2x3 [['', '', a], [b, c, '']]   E2: 1x3 [[b, c, a]]
      Vector(AdvWord(0, 2, 0), AdvWord(1, 0, 0), AdvWord(1, 1, 0))
    case 2 =>
      // ascending staircase: three bands, x strictly ascending across
      // band boundaries -> E2 sees one row; E1 a 3x3 diagonal.
      Vector(AdvWord(0, 0, 0), AdvWord(1, 1, 0), AdvWord(2, 2, 0))
    case 3 =>
      // cross-band cell merge: band1's island-1 slot-1 word continues
      // band0's row AND lands in the same bucket as band0's island-1
      // word -> one E2 cell concatenates words from two bands.
      // E1: 2x2 [[a b, c], ['', d]]   E2: 1x2 [[a b, c d]]
      Vector(AdvWord(0, 0, 0), AdvWord(0, 0, 1), AdvWord(0, 1, 0),
        AdvWord(1, 1, 1))
    case _ =>
      // control: dense grid, every band starts at island 0 -> E1 == E2
      val rows = 2 + rng.nextInt(2)
      val cols = 2 + rng.nextInt(2)
      (for {
        j <- 0 until rows; k <- 0 until cols
        s <- 0 until (1 + (j + k + rng.nextInt(2)) % 2)
      } yield AdvWord(j, k, s)).toVector
  }

  /** Lay a scenario out as word_box spans, shuffled. */
  private def advLayout(words: Vector[AdvWord], rng: Random): Vector[(String, String)] = {
    val laid = words.map { case AdvWord(j, k, s) =>
      val x0 = 0.05 + 0.2 * k + 0.05 * s
      val x1 = x0 + 0.05
      val yTop = 0.05 + 0.2 * j
      val y0 = yTop + rng.nextDouble() * 0.02
      val y1 = yTop + 0.1 - rng.nextDouble() * 0.02
      (Vocab(rng.nextInt(Vocab.length)), f"$x0%.6f,$x1%.6f,$y0%.6f,$y1%.6f")
    }
    rng.shuffle(laid)
  }

  /** One adversarial doc: 1-3 word_box runs (one scenario each,
    * separated by text spans so they stay distinct runs) plus a media
    * span — deterministic in (id, seed).
    */
  def adversarialDoc(id: Long, seed: Long = 97L): Doc = {
    val rng = new Random(seed * 1000003L + id * 7919L)
    val in = new ArrayBuffer[(String, String, String)]
    in += ((SpanKinds.Text, randWords(rng, 2, 5), ""))
    val nRuns = 1 + rng.nextInt(3)
    for (_ <- 0 until nRuns) {
      advLayout(advScenario(rng), rng).foreach { case (w, ref) =>
        in += ((SpanKinds.WordBox, w, ref))
      }
      in += ((SpanKinds.Text, randWords(rng, 2, 5), ""))
    }
    in += ((SpanKinds.Media, "", s"media://adv/$id"))
    Doc(s"adv-$id",
      in.iterator.zipWithIndex.map { case ((k, t, m), i) => Span(k, t, m, i) }.toVector)
  }

  /** The adversarial verification corpus (fixed size — it gates
    * correctness, not throughput).
    */
  def adversarialDocs(spark: SparkSession, n: Int = 200): Dataset[Doc] = {
    import spark.implicits._
    spark.createDataset((0L until n.toLong).map(adversarialDoc(_)))
  }

  /** Pure per-row synthesis used by fromDocuments (exposed for tests). */
  def synthDoc(id: Long, text: String, seed: Long): Doc = {
    val rng = new Random(seed * 1000003L + id * 7919L)
    val words = text.split("\\s+").filter(_.nonEmpty)
    def wordAt(i: Int): String = if (words.isEmpty) Vocab(i % Vocab.length) else words(i % words.length)
    val rows = 2 + (id % 5).toInt
    val cols = 2 + (id % 4).toInt
    var wi = 0
    val cells = (for {
      r <- 0 until rows; c <- 0 until cols
      n = 1 + ((r + c + id).toInt % MaxSlots)
    } yield {
      val ws = Vector.tabulate(n) { k => wordAt(wi + k) }
      wi += n
      (r, c) -> ws
    }).toMap
    val spec = TableSpec(rows, cols, cells)
    val in = new ArrayBuffer[(String, String, String)]
    in += ((SpanKinds.Text, words.take(8).mkString(" "), ""))
    layoutSpans(spec, rng).foreach { case (w, ref) => in += ((SpanKinds.WordBox, w, ref)) }
    in += ((SpanKinds.Text, words.slice(8, 14).mkString(" "), ""))
    in += ((SpanKinds.Media, "", s"media://$id/0"))
    Doc(s"doc-$id",
      in.iterator.zipWithIndex.map { case ((k, t, m), i) => Span(k, t, m, i) }.toVector)
  }
}
