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

  /** Allocation-free parse of one double out of s[from, until): optional
    * sign, digits, optional fraction, optional exponent — the decimal
    * format our geometry convention emits. Returns NaN on malformed
    * input (NaN never appears in valid payloads). Hand-rolled because
    * split+substring+parseDouble was the dominant allocation source of
    * the whole pipeline (~40 short-lived objects per word box).
    */
  def parseDoubleRange(s: String, from: Int, until: Int): Double = {
    var i = from
    while (i < until && s.charAt(i) == ' ') i += 1
    var end = until
    while (end > i && s.charAt(end - 1) == ' ') end -= 1
    if (i >= end) return Double.NaN
    var neg = false
    s.charAt(i) match {
      case '-' => neg = true; i += 1
      case '+' => i += 1
      case _ =>
    }
    var mant = 0.0
    var seenDigit = false
    while (i < end && s.charAt(i) >= '0' && s.charAt(i) <= '9') {
      mant = mant * 10 + (s.charAt(i) - '0')
      seenDigit = true
      i += 1
    }
    var scale = 0
    if (i < end && s.charAt(i) == '.') {
      i += 1
      while (i < end && s.charAt(i) >= '0' && s.charAt(i) <= '9') {
        mant = mant * 10 + (s.charAt(i) - '0')
        scale += 1
        seenDigit = true
        i += 1
      }
    }
    if (!seenDigit) return Double.NaN
    if (i < end && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
      // rare path: fall back to the JDK parser for exponent forms
      return try java.lang.Double.parseDouble(s.substring(from, until).trim)
      catch { case _: NumberFormatException => Double.NaN }
    }
    if (i != end) return Double.NaN
    if (scale >= Pow10.length || mant > 9.007199254740992e15) {
      // >15 significant digits: defer to the JDK's correctly-rounded parse
      return try java.lang.Double.parseDouble(s.substring(from, until).trim)
      catch { case _: NumberFormatException => Double.NaN }
    }
    // mant and 10^scale are both exact doubles here, so IEEE division
    // yields the correctly-rounded value == Double.parseDouble's result
    val v = mant / Pow10(scale)
    if (neg) -v else v
  }

  private val Pow10: Array[Double] = Array.tabulate(19)(k => math.pow(10, k))

  def parseBBox(mediaRef: String): Option[(Double, Double, Double, Double)] = {
    val b = wordBoxOfRef(mediaRef, "")
    if (b == null) None else Some((b.leftX, b.rightX, b.topY, b.bottomY))
  }

  /** Null on malformed payload (hot path; Option boxing avoided). */
  def wordBoxOfRef(mediaRef: String, text: String): WordBox = {
    val c1 = mediaRef.indexOf(',')
    if (c1 < 0) return null
    val c2 = mediaRef.indexOf(',', c1 + 1)
    if (c2 < 0) return null
    val c3 = mediaRef.indexOf(',', c2 + 1)
    if (c3 < 0 || mediaRef.indexOf(',', c3 + 1) >= 0) return null
    val x0 = parseDoubleRange(mediaRef, 0, c1)
    val x1 = parseDoubleRange(mediaRef, c1 + 1, c2)
    val y0 = parseDoubleRange(mediaRef, c2 + 1, c3)
    val y1 = parseDoubleRange(mediaRef, c3 + 1, mediaRef.length)
    if (x0.isNaN || x1.isNaN || y0.isNaN || y1.isNaN) return null
    if (x1 < x0 || y1 < y0) return null
    WordBox(text, x0, x1, y0, y1)
  }

  def wordBoxOf(span: Span): Option[WordBox] =
    if (span.kind != SpanKinds.WordBox) None
    else Option(wordBoxOfRef(span.media_ref, span.text))

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
