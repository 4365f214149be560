package graft.html

import scala.collection.mutable.ArrayBuffer

/** Density-based HTML boilerplate stripping (north_rule scope — the
  * reference only *generates* HTML, /root/reference/html/html.go:86-105;
  * this stage is the main-content-extraction counterpart for `html`-kind
  * spans).
  *
  * The heuristic is a simplified densometric classifier in the style of
  * the published Boilerpipe work (Kohlschütter et al., WSDM 2010): the
  * fragment is segmented into text blocks at block-level tag boundaries,
  * `<script>`/`<style>`/comments are discarded wholesale, and a block is
  * kept iff it has at least one word and its link density (words inside
  * `<a>` / total words) is at most 1/3. Deterministic, allocation-light,
  * no external parser — a hand-rolled tag tokenizer is enough because
  * inputs are fragments, not adversarial full pages.
  */
object HtmlStrip {

  private val BlockTags: Set[String] = Set(
    "div", "p", "table", "thead", "tbody", "tr", "td", "th", "li", "ul",
    "ol", "h1", "h2", "h3", "h4", "h5", "h6", "br", "hr", "body", "head",
    "html", "header", "footer", "nav", "aside", "section", "article",
    "blockquote", "pre", "form", "title")

  private val DropTags: Set[String] = Set("script", "style")

  final case class Block(text: String, words: Int, linkWords: Int) {
    def linkDensity: Double = if (words == 0) 0.0 else linkWords.toDouble / words
  }

  private val EntityMap = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ")

  private def decodeEntities(s: String): String = {
    if (!s.contains('&')) return s
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 8) {
          val name = s.substring(i + 1, semi)
          EntityMap.get(name.toLowerCase) match {
            case Some(rep) => out.append(rep); i = semi + 1
            case None =>
              if (name.startsWith("#")) {
                try {
                  val cp =
                    if (name.length > 1 && (name.charAt(1) == 'x' || name.charAt(1) == 'X'))
                      Integer.parseInt(name.substring(2), 16)
                    else Integer.parseInt(name.substring(1))
                  out.appendAll(Character.toChars(cp)); i = semi + 1
                } catch { case _: Exception => out.append(c); i += 1 }
              } else { out.append(c); i += 1 }
          }
        } else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.result()
  }

  /** Segment an HTML fragment into text blocks with word / link-word
    * counts. Pure and total: malformed markup degrades to text.
    */
  def blocks(html: String): Vector[Block] = {
    val out = new ArrayBuffer[Block]
    val text = new StringBuilder
    var textWords = 0
    var linkWords = 0
    var anchorDepth = 0
    var dropDepth = 0

    def flush(): Unit = {
      val t = text.result().split("\\s+").filter(_.nonEmpty).mkString(" ")
      if (t.nonEmpty) out += Block(t, textWords, linkWords)
      text.clear(); textWords = 0; linkWords = 0
    }

    // Raw text chunks concatenate verbatim (inline tags like <a> insert
    // no whitespace); flush() normalizes runs of whitespace to single
    // spaces. Word counts are attributed per chunk for link density.
    def addText(raw: String): Unit = {
      if (dropDepth > 0) return
      val decoded = decodeEntities(raw)
      val n = decoded.split("\\s+").count(_.nonEmpty)
      if (n > 0) {
        textWords += n
        if (anchorDepth > 0) linkWords += n
      }
      text.append(decoded)
    }

    var i = 0
    val n = html.length
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) { addText(html.substring(i)); i = n }
      else {
        if (lt > i) addText(html.substring(i, lt))
        if (html.startsWith("<!--", lt)) {
          val end = html.indexOf("-->", lt + 4)
          i = if (end < 0) n else end + 3
        } else {
          val gt = html.indexOf('>', lt + 1)
          if (gt < 0) { addText(html.substring(lt)); i = n }
          else {
            val inner = html.substring(lt + 1, gt).trim
            val closing = inner.startsWith("/")
            val nameRaw = (if (closing) inner.drop(1) else inner)
              .takeWhile(c => !c.isWhitespace && c != '/' && c != '>')
            val name = nameRaw.toLowerCase
            if (DropTags.contains(name)) {
              if (closing) dropDepth = math.max(0, dropDepth - 1)
              else if (!inner.endsWith("/")) dropDepth += 1
            } else if (name == "a") {
              if (closing) anchorDepth = math.max(0, anchorDepth - 1)
              else if (!inner.endsWith("/")) anchorDepth += 1
            } else if (BlockTags.contains(name)) {
              flush()
            }
            i = gt + 1
          }
        }
      }
    }
    flush()
    out.toVector
  }

  /** Blocks surviving the density filter: ≥1 word, link density ≤ 1/3. */
  def mainContentBlocks(html: String): Vector[String] =
    blocks(html).filter(b => b.words > 0 && b.linkDensity <= (1.0 / 3.0)).map(_.text)

  /** Main content as one string (kept blocks, space-joined). */
  def strip(html: String): String = mainContentBlocks(html).mkString(" ")
}
