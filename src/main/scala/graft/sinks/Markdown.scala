package graft.sinks

/** GitHub-flavored-markdown table serialization — the linearization an
  * LLM training pipeline applies to recovered tables so they survive as
  * plain text in the training stream (the reference stops at CSV/HTML,
  * csv/csv.go + html/html.go; markdown is the training-side sibling).
  *
  * Format: first table row is the header, then a `| --- |` separator
  * sized to the header's column count, then the remaining rows. Cells
  * escape `|` as `\|` and newlines as `<br>` so one table row stays one
  * output line. Like [[Csv]], this is a pure per-table function applied
  * to the extraction's own table IR (never re-parsed from cell refs —
  * pass-through cells keep arbitrary original refs, and adjacent tables
  * would merge).
  */
object Markdown {

  def escapeCell(cell: String): String =
    cell.replace("|", "\\|").replace("\n", "<br>")

  def encodeRow(row: Seq[String]): String =
    row.map(escapeCell).mkString("| ", " | ", " |")

  /** Separator line for `n` columns: `| --- | --- |` etc. */
  def separator(n: Int): String = "| --- " * n + "|"

  /** table -> markdown string; empty table -> empty string. Rows keep
    * their own widths (a ragged row serializes with its own cell
    * count); the separator follows the header's width.
    */
  def fromTable(table: Seq[Seq[String]]): String =
    if (table.isEmpty) ""
    else (encodeRow(table.head) +: separator(table.head.size) +:
      table.tail.map(encodeRow)).mkString("\n")
}
