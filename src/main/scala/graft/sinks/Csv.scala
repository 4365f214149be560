package graft.sinks

/** RFC-4180 CSV serialization with Go `encoding/csv` writer parity —
  * the reference's CSV sink (csv/csv.go:8-16) uses the Go defaults:
  * comma separator, "\n" record terminator, a field is quoted only when
  * it is `\.`, contains a comma / quote / CR / LF, or starts with a
  * space character; quotes escape as "".
  *
  * Spark's own CSV writer quotes differently (and is per-file, not
  * per-value), so span-text assembly uses this pure function; bulk table
  * dumps still go through `df.write.csv`.
  */
object Csv {

  // unicode.IsSpace for the chars Go checks on the first rune
  private def isGoSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000b' || c == '\f' ||
      c == '\r' || c == '\u0085' || c == '\u00a0'

  def fieldNeedsQuotes(field: String): Boolean =
    if (field.isEmpty) false
    else if (field == "\\.") true
    else if (field.exists(c => c == ',' || c == '"' || c == '\r' || c == '\n')) true
    else isGoSpace(field.charAt(0))

  def encodeField(field: String): String =
    if (!fieldNeedsQuotes(field)) field
    else "\"" + field.replace("\"", "\"\"") + "\""

  def encodeRow(row: Seq[String]): String =
    row.map(encodeField).mkString(",")

  /** table -> CSV string; one record per row, "\n" terminated
    * (csv/csv.go:8-16 via Go csv.Writer defaults).
    */
  def fromTable(table: Seq[Seq[String]]): String = {
    val sb = new StringBuilder
    for (row <- table) {
      sb.append(encodeRow(row))
      sb.append('\n')
    }
    sb.result()
  }
}
