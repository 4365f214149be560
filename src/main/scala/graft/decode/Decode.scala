package graft.decode

import graft.{Span, SpanKinds, WordBox}

/** Span payload decoders — the deterministic replacement for the
  * reference's per-request OCR sources (SURVEY.md S6-S8): word geometry
  * is carried in the input spans, so the "OCR" stage is a pure decode.
  *
  * Conventions (FIXTURES.md §2):
  *  - `word_box` spans: media_ref = "x0,x1,y0,y1" normalized [0,1],
  *    origin top-left, y grows downward (the coordinate system at
  *    /root/reference/textract/textract.go:225-231).
  *  - `cell` spans: media_ref = "row,col", 1-based (the Textract
  *    CELL RowIndex/ColumnIndex, /root/reference/textract/textract.go:142-147).
  *
  * Malformed payloads decode to None; callers treat the span as opaque
  * pass-through (the reference would have failed the whole request).
  */
object Decode {

  def parseBBox(mediaRef: String): Option[(Double, Double, Double, Double)] = {
    val parts = mediaRef.split(',')
    if (parts.length != 4) None
    else
      try {
        val x0 = parts(0).trim.toDouble
        val x1 = parts(1).trim.toDouble
        val y0 = parts(2).trim.toDouble
        val y1 = parts(3).trim.toDouble
        if (x1 < x0 || y1 < y0) None else Some((x0, x1, y0, y1))
      } catch { case _: NumberFormatException => None }
  }

  def wordBoxOf(span: Span): Option[WordBox] =
    if (span.kind != SpanKinds.WordBox) None
    else parseBBox(span.media_ref).map { case (x0, x1, y0, y1) =>
      WordBox(span.text, x0, x1, y0, y1)
    }

  def cellOf(span: Span): Option[(Int, Int, String)] =
    if (span.kind != SpanKinds.Cell) None
    else {
      val parts = span.media_ref.split(',')
      if (parts.length != 2) None
      else
        try {
          val r = parts(0).trim.toInt
          val c = parts(1).trim.toInt
          if (r < 1 || c < 1) None else Some((r, c, span.text))
        } catch { case _: NumberFormatException => None }
    }
}
