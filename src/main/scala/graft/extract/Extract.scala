package graft.extract

import graft._
import graft.decode.Decode
import graft.geom.Geom
import graft.html.HtmlStrip

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

/** The engine core: `Dataset[Doc] => Dataset[ExtractedDoc]`.
  *
  * Per document (pure, record-local — the Spark-idiomatic home for the
  * reference's loop-carried-state algorithms, SURVEY.md §7):
  *  - spans are walked in `offset` order;
  *  - each maximal run of `word_box` spans is one table's OCR output:
  *    decoded to word boxes and structure-recovered with E1
  *    (region clustering, box/box.go:250-280) or E2 (split heuristic,
  *    textract/textract.go:214-265), then serialized row-major as
  *    `cell` spans with media_ref "row,col" (1-based);
  *  - each maximal run of `cell` spans is a pre-structured table (E3,
  *    textract/textract.go:121-175), re-serialized the same way; if the
  *    indices are invalid (where the reference panics) the original
  *    spans pass through unchanged;
  *  - `html` spans are boilerplate-stripped to one `text` span per kept
  *    block (density heuristic, graft.html.HtmlStrip);
  *  - `text` / `media` / unknown spans pass through.
  * Output offsets are renumbered 0..n-1 — the ordered span sequence of
  * the north_rule's `(kind, text, media_ref, order)` invariant.
  *
  * Distribution: one row = one document, so the map is embarrassingly
  * parallel with no shuffle needed for correctness. `distributed` adds
  * the one planned exchange: a salted hash repartition on doc_id that
  * (a) decorrelates oversized documents from input-file adjacency and
  * (b) oversubscribes partitions vs cores so stragglers interleave —
  * the skew posture for 100 TB inputs (SURVEY.md §4).
  */
object Extract {

  sealed trait Strategy
  object Strategy {
    /** E1 — region-clustering (the reference's live path). */
    case object RegionClustering extends Strategy
    /** E2 — split-gap heuristic. */
    case object SplitHeuristic extends Strategy
  }

  /** Serialize a recovered table row-major as cell spans (1-based
    * "row,col" refs), mirroring the reference's [][]string IR.
    */
  def tableToSpans(table: Vector[Vector[String]]): Vector[(String, String, String)] = {
    val out = Vector.newBuilder[(String, String, String)]
    var r = 0
    while (r < table.length) {
      val row = table(r)
      var c = 0
      while (c < row.length) {
        out += ((SpanKinds.Cell, row(c), s"${r + 1},${c + 1}"))
        c += 1
      }
      r += 1
    }
    out.result()
  }

  /** Total function: a document that trips an unexpected per-doc error
    * (e.g. a comparator-contract violation from adversarial geometry in
    * the E2 path) passes through unchanged with status "error:<class>"
    * instead of failing the job — at 10^12 documents a single bad row
    * must not kill the run; the lineage table records it.
    */
  def extractDoc(doc: Doc, strategy: Strategy = Strategy.RegionClustering): ExtractedDoc =
    try extractDocUnsafe(doc, strategy)
    catch {
      case scala.util.control.NonFatal(e) =>
        val spans = doc.spans.sortBy(_.offset).iterator.zipWithIndex
          .map { case (s, i) => Span(s.kind, s.text, s.media_ref, i) }.toVector
        ExtractedDoc(doc.doc_id, spans, 0, 0, s"error:${e.getClass.getSimpleName}")
    }

  private def extractDocUnsafe(doc: Doc, strategy: Strategy): ExtractedDoc = {
    val sorted = doc.spans.sortBy(_.offset).toVector
    val out = new ArrayBuffer[(String, String, String)](sorted.length)
    var nTables = 0
    var nCells = 0

    def emitTable(table: Vector[Vector[String]]): Unit = {
      val cells = tableToSpans(table)
      if (cells.nonEmpty) {
        nTables += 1
        nCells += cells.length
        out ++= cells
      }
    }

    var i = 0
    val n = sorted.length
    while (i < n) {
      val s = sorted(i)
      s.kind match {
        case SpanKinds.WordBox =>
          var j = i
          while (j < n && sorted(j).kind == SpanKinds.WordBox) j += 1
          val run = sorted.slice(i, j)
          val boxes = run.flatMap(Decode.wordBoxOf)
          if (boxes.isEmpty) {
            // empty/undecodable word run: pass through (SURVEY §2.8.8)
            run.foreach(sp => out += ((sp.kind, sp.text, sp.media_ref)))
          } else {
            val table = strategy match {
              case Strategy.RegionClustering => Geom.toTable(boxes)
              case Strategy.SplitHeuristic   => Geom.toTableSplitHeuristic(boxes)
            }
            emitTable(table)
          }
          i = j
        case SpanKinds.Cell =>
          var j = i
          while (j < n && sorted(j).kind == SpanKinds.Cell) j += 1
          val run = sorted.slice(i, j)
          val cells = run.flatMap(Decode.cellOf)
          val decoded =
            if (cells.length == run.length) Geom.cellsToTable(cells) else None
          decoded match {
            case Some(table) => emitTable(table)
            case None => // invalid grid (reference panics): pass through
              run.foreach(sp => out += ((sp.kind, sp.text, sp.media_ref)))
          }
          i = j
        case SpanKinds.Html =>
          HtmlStrip.mainContentBlocks(s.text).foreach { block =>
            out += ((SpanKinds.Text, block, ""))
          }
          i += 1
        case _ => // text / media / unknown: pass through
          out += ((s.kind, s.text, s.media_ref))
          i += 1
      }
    }

    val spans = out.iterator.zipWithIndex.map { case ((k, t, m), idx) =>
      Span(k, t, m, idx)
    }.toVector
    ExtractedDoc(doc.doc_id, spans, nTables, nCells, "ok")
  }

  /** Local (already-partitioned) transform — no shuffle. */
  def run(ds: Dataset[Doc], strategy: Strategy = Strategy.RegionClustering): Dataset[ExtractedDoc] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[ExtractedDoc]
    ds.mapPartitions(_.map(extractDoc(_, strategy)))
  }

  /** Distributed transform with the explicit skew posture: salted hash
    * repartition on doc_id into `numPartitions` (default 4x the session
    * parallelism so oversized-document stragglers interleave), then the
    * per-partition map. doc_id is unique, so hash(doc_id, salt) is
    * uniform in row count; the salt decorrelates any size-ordered input
    * layout. Exactly one exchange in the plan.
    */
  def distributed(
      spark: SparkSession,
      ds: Dataset[Doc],
      strategy: Strategy = Strategy.RegionClustering,
      numPartitions: Int = 0,
      salt: Int = 16): Dataset[ExtractedDoc] = {
    val parts =
      if (numPartitions > 0) numPartitions
      else math.max(1, spark.sparkContext.defaultParallelism * 4)
    implicit val docEnc = org.apache.spark.sql.Encoders.product[Doc]
    val salted = ds
      .repartition(parts, pmod(xxhash64(col("doc_id"), lit(salt)), lit(parts)))
      .as[Doc]
    run(salted, strategy)
  }
}
