package graft.sinks

/** HTML sink with byte parity to the reference's Go text/template
  * rendering (html/html.go:25-81, FromTable html/html.go:86-105).
  *
  * Notes preserved from the reference:
  *  - Go's text/template does NOT HTML-escape cell text (it is not
  *    html/template) — neither do we;
  *  - the image variant embeds `<img src>`, the pdf variant links the
  *    original PDF;
  *  - whitespace (tabs/newlines) comes from the template literal, with
  *    `{{range}}` blocks expanding before each row/cell.
  */
object Html {

  private val head =
    "\n<!DOCTYPE html>\n<html>\n\t<head>\n\t\t<meta charset=\"UTF-8\">\n" +
      "\t\t<style>\n\t\t\ttable, th, td {\n\t\t\t\tborder: 1px solid black;\n" +
      "\t\t\t\tborder-collapse: collapse;\n\t\t\t\tpadding: 5px;\n\t\t\t}\n" +
      "\t\t</style>\n\t</head>\n\t<body>\n" +
      "\t\tExtract Table by Vegard Stikbakke. Go back " +
      "<a href=\"https://extract-table.com\">home</a>.\n" +
      "\t\t<br /><br />\n"

  private def tableHtml(table: Seq[Seq[String]]): String = {
    val sb = new StringBuilder
    sb.append("\t\t<table>")
    for (row <- table) {
      sb.append("\n\t\t\t<tr>")
      for (cell <- row) sb.append("\n\t\t\t\t<td>").append(cell).append("</td>")
      sb.append("\n\t\t\t</tr>")
    }
    sb.append("\n\t\t</table>\n")
    sb.result()
  }

  /** Image variant (html/html.go:25-52). */
  def fromTableImage(table: Seq[Seq[String]], imageUrl: String, csvUrl: String): String =
    head +
      s"""\t\t<a href="$csvUrl">Download CSV.</a>\n\t\t<br /><br />\n""" +
      tableHtml(table) +
      s"""\t\t<br />\n\t\t<img src="$imageUrl">\n\t</body>\n</html>\n"""

  /** PDF variant (html/html.go:54-81). */
  def fromTablePdf(table: Seq[Seq[String]], pdfUrl: String, csvUrl: String): String =
    head +
      s"""\t\t<a href="$csvUrl">Download CSV.</a>\n\t\t<br /><br />\n""" +
      tableHtml(table) +
      s"""\t\t<br />\n\t\t<a href="$pdfUrl">Original PDF.</a>\n\t</body>\n</html>\n"""
}
