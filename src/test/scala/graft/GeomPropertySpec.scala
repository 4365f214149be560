package graft

import graft.extract.Extract
import graft.fixtures.SpanGen
import graft.geom.Geom
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Property tests (SURVEY.md §5.3) over generator-valid layouts:
  *  1. every input word's text lands in exactly one cell, exactly once;
  *  2. permuting input word order never changes the E1 output;
  *  3. table shape equals occupied rows x occupied cols;
  *  4. E1 equals the generator's expected table (independent oracle);
  *  5. extractDoc golden equality for arbitrary seeds;
  *  6. interval-union invariants (sorted, disjoint, covering).
  */
class GeomPropertySpec extends AnyFunSuite {

  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(80), p)
    assert(res.passed, res.status.toString)
  }

  /** Seed-driven random-but-valid table spec (FIXTURES.md §2 rules). */
  private def mkSpec(seed: Long): SpanGen.TableSpec = {
    val rng = new Random(seed)
    val rows = 2 + rng.nextInt(6)
    val cols = 2 + rng.nextInt(5)
    val cells = (for {
      r <- 0 until rows
      c <- 0 until cols
      if rng.nextDouble() < 0.8
      n = 1 + rng.nextInt(SpanGen.MaxSlots)
    } yield (r, c) -> Vector.fill(n)(SpanGen.Vocab(rng.nextInt(SpanGen.Vocab.length)))).toMap
    SpanGen.TableSpec(rows, cols, cells)
  }

  private def boxesOf(spec: SpanGen.TableSpec, seed: Long): Vector[WordBox] =
    SpanGen.layoutSpans(spec, new Random(seed)).map { case (w, ref) =>
      val bb = graft.decode.Decode.parseBBox(ref).get
      WordBox(w, bb._1, bb._2, bb._3, bb._4)
    }

  private val seedGen: Gen[Long] = Gen.choose(0L, 1000000L)

  test("every word's text appears exactly once across all cells") {
    checkProp(Prop.forAll(seedGen) { seed =>
      val spec = mkSpec(seed)
      val boxes = boxesOf(spec, seed + 1)
      boxes.isEmpty || {
        val emitted = Geom.toTable(boxes)
          .flatten.flatMap(_.split(' ')).filter(_.nonEmpty).sorted
        emitted == boxes.map(_.text).sorted
      }
    })
  }

  test("E1 output is invariant under input permutation") {
    checkProp(Prop.forAll(seedGen, Gen.choose(0L, 999L)) { (seed, shuffleSeed) =>
      val boxes = boxesOf(mkSpec(seed), seed + 1)
      boxes.isEmpty || {
        val shuffled = new Random(shuffleSeed).shuffle(boxes)
        Geom.toTable(shuffled) == Geom.toTable(boxes)
      }
    })
  }

  test("table shape equals occupied rows x occupied cols") {
    checkProp(Prop.forAll(seedGen) { seed =>
      val spec = mkSpec(seed)
      val boxes = boxesOf(spec, seed + 1)
      boxes.isEmpty || {
        val table = Geom.toTable(boxes)
        table.length == spec.occupiedRows.length &&
          table.forall(_.length == spec.occupiedCols.length)
      }
    })
  }

  test("E1 equals the generator's expected table (independent oracle)") {
    checkProp(Prop.forAll(seedGen) { seed =>
      val spec = mkSpec(seed)
      val boxes = boxesOf(spec, seed + 1)
      boxes.isEmpty || Geom.toTable(boxes) == spec.expectedTable
    })
  }

  test("extractDoc golden equality for arbitrary generator seeds") {
    checkProp(Prop.forAll(Gen.choose(0L, 50000L), Gen.choose(0L, 500L)) { (seed, docId) =>
      val (doc, golden) = SpanGen.genDoc(docId, seed)
      Extract.extractDoc(doc).spans == golden
    })
  }

  test("E2 edge == E2 midpoint through the composed pipeline, for ANY boxes") {
    // Proof sketch (cited in SpanGen's adversarial-corpus notes): a
    // FindSplits gap midpoint m lies strictly inside a gap (a, b) where
    // every word earlier in leftX order has rightX <= a and every later
    // word has leftX >= b — so no word's extent contains m, and its left
    // edge and x-midpoint are always on the SAME side of every split.
    // Both bucketing variants therefore make identical pointer decisions.
    // This property quantifies over UNCONSTRAINED random boxes, not just
    // fixture-valid layouts.
    val boxGen = Gen.listOf(for {
      x0 <- Gen.choose(0.0, 1.0)
      w <- Gen.choose(0.0, 0.4)
      y0 <- Gen.choose(0.0, 1.0)
      h <- Gen.choose(0.001, 0.2)
      t <- Gen.oneOf(SpanGen.Vocab)
    } yield WordBox(t, x0, x0 + w, y0, y0 + h))
    checkProp(Prop.forAll(boxGen) { boxes =>
      // partitionIntoRows needs a total row order; overlap chains can
      // trip TimSort. Catch each variant SEPARATELY: the property also
      // asserts they fail identically — one variant throwing while the
      // other succeeds would itself be a divergence.
      def run(f: collection.Seq[WordBox] => Vector[Vector[String]]) =
        try Right(f(boxes)) catch { case _: IllegalArgumentException => Left(()) }
      run(Geom.toTableSplitHeuristic) == run(Geom.toTableSplitHeuristicMidpoint)
    })
  }

  test("interval union invariants: sorted, disjoint, covering") {
    val regGen = Gen.listOf(for {
      a <- Gen.choose(0.0, 1.0)
      len <- Gen.choose(0.0, 0.3)
    } yield Region(a, a + len))
    checkProp(Prop.forAll(regGen) { regions =>
      val u = Geom.intervalUnion(regions)
      val sortedDisjoint = u.zip(u.drop(1)).forall { case (a, b) => a.end < b.start }
      val covers = regions.forall(r => u.exists(x => x.start <= r.start && r.end <= x.end))
      sortedDisjoint && covers
    })
  }
}
