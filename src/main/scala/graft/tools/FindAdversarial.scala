package graft.tools

import graft._
import graft.extract.Extract

import scala.util.Random

/** One-off search tool: find a seed whose random overlapping-band
  * geometry trips TimSort's comparator-contract check in the E2 path
  * (>32 spans so the merge machinery engages), on the typed path.
  * Used to pin deterministic fixtures for the error-path parity tests.
  */
object FindAdversarial {
  def mkDoc(seed: Int, nBoxes: Int): Doc = {
    val rng = new Random(seed)
    val spans = (0 until nBoxes).map { k =>
      val x0 = rng.nextDouble()
      val y0 = rng.nextDouble()
      val w = rng.nextDouble() * 0.5
      val h = rng.nextDouble() * 0.9
      Span("word_box", s"w$k", f"$x0%.6f,${x0 + w}%.6f,$y0%.6f,${y0 + h}%.6f", k)
    }.toVector
    Doc(s"adv-$seed", spans)
  }

  def main(args: Array[String]): Unit = {
    var found = 0
    var seed = 0
    while (found < 5 && seed < 50000) {
      val doc = mkDoc(seed, 64)
      val e = Extract.extractDoc(doc, Extract.Strategy.SplitHeuristic)
      if (e.status.startsWith("error:")) {
        println(s"seed=$seed status=${e.status}")
        found += 1
      }
      seed += 1
    }
    if (found == 0) println("none found")
  }
}
