package graft

/** Core data model for the extraction engine.
  *
  * Input shape per BASELINE.json `input_hint`:
  * {{{
  *   doc_id: string
  *   spans:  array<struct<kind:string, text:string, media_ref:string, offset:int>>
  * }}}
  *
  * Span kinds (see FIXTURES.md §2):
  *  - `text`     plain prose, passed through
  *  - `word_box` an OCR word; `media_ref` carries the normalized bbox
  *               "x0,x1,y0,y1" (origin top-left, y grows downward — the
  *               coordinate system documented at
  *               /root/reference/textract/textract.go:225-231)
  *  - `cell`     pre-structured table cell; `media_ref` = "row,col" 1-based
  *               (the reference's Textract TABLE/CELL path,
  *               textract/textract.go:121-175)
  *  - `html`     an HTML fragment to boilerplate-strip
  *  - `media`    opaque media reference, passed through
  *
  * Output spans replace each run of `word_box`/`cell` spans with the
  * recovered table serialized row-major as `cell` spans
  * (`media_ref` = "row,col" 1-based), mirroring the reference's
  * `[][]string` IR (box/box.go:250-280).
  */
final case class Span(kind: String, text: String, media_ref: String, offset: Int)

final case class Doc(doc_id: String, spans: Seq[Span])

/** A word with its axis-aligned normalized bounding box — the reference's
  * `Word` (extract.go:7-13) and `Box` (box/box.go:11-17) unified.
  * Coordinates in [0,1], origin top-left, y grows downward.
  */
final case class WordBox(
    text: String,
    leftX: Double,
    rightX: Double,
    topY: Double,
    bottomY: Double)

/** A closed 1-D interval [start, end]; the reference's `[]float64{start,end}`
  * region (box/box.go:53-100).
  */
final case class Region(start: Double, end: Double) {
  /** Closed-interval overlap — the reference's XOverlap/YOverlap
    * (box/box.go:26-49): touching intervals count as overlapping.
    */
  def overlaps(o: Region): Boolean = end >= o.start && start <= o.end
}

final case class ExtractedDoc(
    doc_id: String,
    spans: Seq[Span],
    n_tables: Int,
    n_cells: Int,
    status: String)

object SpanKinds {
  val Text = "text"
  val WordBox = "word_box"
  val Cell = "cell"
  val Html = "html"
  val Media = "media"
}
