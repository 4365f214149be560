package graft.dedup

import graft.PortableHash
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Line-level boilerplate removal (the CCNet/RefinedWeb "paragraph
  * dedup" stage): lines whose normalized form repeats across more than
  * a threshold number of documents — navigation strings, cookie
  * banners, copyright footers — are stripped from EVERY document, and
  * each document's text is rebuilt from its surviving lines in the
  * original order.
  *
  * Distinct from [[Substring]] (passage dedup): that finds long shared
  * SPANS between document pairs; this counts exact normalized LINES
  * across the whole corpus and cuts by global frequency — the cheap
  * first-pass that deletes the web's structural boilerplate before the
  * expensive near-dup machinery runs.
  *
  * Scale shape (10^12 docs): two shuffles total. (1) line-frequency
  * count — groupBy on a 60-bit line hash with map-side partial
  * aggregation; the key space is bounded by distinct lines, not docs.
  * (2) doc reconstruction — groupBy doc_id over the kept lines. The
  * frequent-line set itself (count > maxDocs) is tiny relative to the
  * corpus — boilerplate is by definition few distinct strings — so it
  * broadcasts and the strip is a broadcast anti-join, never a third
  * full shuffle. Lines are carried as (hash, pos) pairs between
  * stages; full line text only travels inside its own document's row.
  */
object LineDedup {

  /** Normalized per-line key: case-folded, surrounding ASCII
    * whitespace trimmed. Empty-after-trim lines are never counted
    * (they are neither boilerplate nor content; they are preserved
    * verbatim in reconstruction only through position gaps — i.e.
    * dropped, matching the reference pipelines which re-join on
    * single newlines).
    */
  def lineKey(line: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    lower(trim(line))

  /** Exploded (id, pos, line, line_hash) view of a corpus, one row per
    * non-empty normalized line. `pos` is the 0-based line index within
    * the document, preserved for order-stable reconstruction.
    */
  def explodeLines(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .filter(lineKey(col("line")) =!= "")
      .withColumn("line_hash", PortableHash.md5Hash60(lineKey(col("line"))))

  /** Per-distinct-line document frequency: (line_hash, n_docs) where
    * n_docs counts DISTINCT documents containing the normalized line
    * (a line repeated inside one doc counts once). One shuffle,
    * map-side-combined.
    */
  def lineStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    explodeLines(df, idCol, textCol)
      .select(col("line_hash"), col(idCol))
      .distinct()
      .groupBy("line_hash")
      .agg(count(lit(1)).as("n_docs"))

  /** INTRA-document duplicate-line removal (RefinedWeb's in-doc repeat
    * strip): within each document, keep only the FIRST occurrence of
    * each normalized line; later repeats — chorus spam, duplicated nav
    * blocks inside one page — drop. Order-preserving; blank lines keep
    * the corpus-wide convention of dropping at rebuild.
    *
    * Scale shape: fully record-local — a per-row HOF filter (line i
    * survives iff the first list_position of its normalized form is i),
    * zero shuffles, never materializes anything beyond one document's
    * own lines. Quadratic in LINES PER DOCUMENT (position scan per
    * line), which is bounded by document size, not corpus size.
    * Output (id, text_clean, n_kept) like the other line filters.
    */
  def dedupLinesWithinDoc(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // keys materialize as a real column FIRST: a filter lambda that
    // captured transform(split(...)) would re-evaluate that whole
    // subtree per element (the shingleArray HOF-CSE hazard); capturing
    // an attribute only reads the row value
    val kept = filter(col("__lines"), (l, i) =>
      lineKey(l) =!= "" && array_position(col("__keys"), lineKey(l)) === i + 1)
    df.withColumn("__lines", split(col(textCol), "\n"))
      .withColumn("__keys", transform(col("__lines"), l => lineKey(l)))
      .select(col(idCol),
        concat_ws("\n", kept).as("text_clean"),
        size(kept).cast("bigint").as("n_kept"))
  }

  /** Keep only lines satisfying `pred` (evaluated on the raw line);
    * rebuild each document from survivors in original order — the
    * generic per-line filter behind C4-style line rules (e.g. "keep
    * lines ending in terminal punctuation"). Same reconstruction
    * contract as [[stripDuplicatedLines]]: (id, text_clean, n_kept),
    * all-filtered docs survive with empty text. One shuffle (the
    * per-doc rebuild); the predicate runs in the scan stage.
    */
  def filterLines(df: DataFrame, idCol: String, textCol: String,
      pred: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame =
    rebuild(df, idCol, explodeLines(df, idCol, textCol).filter(pred(col("line"))))

  /** Order-stable per-doc reconstruction of surviving (id, pos, line)
    * rows; docs with no survivors keep an empty-text row.
    */
  private def rebuild(df: DataFrame, idCol: String, kept: DataFrame): DataFrame = {
    val rebuilt = kept
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            e => e("line")),
          "\n").as("text_clean"),
        count(lit(1)).as("n_kept"))
    df.select(col(idCol))
      .join(rebuilt, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("text_clean"), lit("")).as("text_clean"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** C4's terminal-punctuation rule: a line survives iff it ends in
    * '.', '!', '?', or '"' (after ASCII right-trim).
    */
  def terminalPunctuation(line: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    rtrim(line).rlike("[.!?\"]$")

  /** Strip every line that appears in more than `maxDocs` distinct
    * documents; rebuild each document's text from its surviving lines
    * joined by '\n' in original order. Returns
    * (id, text_clean, n_kept). Documents whose every line
    * was boilerplate survive with empty text and n_kept = 0 — the
    * caller decides whether to cut them (a length filter downstream).
    */
  def stripDuplicatedLines(
      df: DataFrame, idCol: String, textCol: String, maxDocs: Long): DataFrame = {
    val lines = explodeLines(df, idCol, textCol)
    val frequent = lineStats(df, idCol, textCol)
      .filter(col("n_docs") > maxDocs)
      .select(col("line_hash"))
    // broadcast anti-join strip, then the shared order-stable rebuild
    rebuild(df, idCol,
      lines.join(broadcast(frequent), Seq("line_hash"), "left_anti"))
  }
}
