package graft.extract

import graft.Doc
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Column-type inference over recovered tables — the post-extraction
  * step that turns a grid of strings into a typed schema (int / num /
  * date / bool / empty / text per column) plus a header signal, so
  * downstream consumers can load extracted tables as data rather than
  * prose. The reference stops at serializing the grid (csv/csv.go);
  * typing it is the training-/analytics-side continuation.
  *
  * Cells come from the extraction's own table IR (same rationale as the
  * CSV sink: pass-through cells keep arbitrary original refs, so
  * re-parsing flattened span refs would merge adjacent tables); the
  * inference itself is pure relational Column logic.
  *
  * Scale shape: classify is a codegen'd CASE over anchored regexes;
  * majority = one partial-agg groupBy on (doc, table, column, type)
  * then a row_number window over the tiny per-column type histogram
  * (<= 6 rows per column). No self-joins; the header attaches by a
  * (doc, table, column) equi-join against a frame that is one row per
  * column.
  */
object TableTypes {

  /** Exploded dense-indexed cells: (id, table_idx, i, j, txt) with i, j
    * 1-based row/column positions.
    */
  def cellRows(docs: Dataset[Doc]): DataFrame = {
    import docs.sparkSession.implicits._
    docs.flatMap { d =>
      val (_, tables) = Extract.extractDocTables(d)
      for {
        (tb, t) <- tables.iterator.zipWithIndex
        (row, i) <- tb.iterator.zipWithIndex
        (cell, j) <- row.iterator.zipWithIndex
      } yield (d.doc_id, t, i + 1, j + 1, cell)
    }.toDF("doc_id", "table_idx", "i", "j", "txt")
  }

  /** Cell type: empty / int / num / date / bool / text. Anchored
    * regexes from the RE2-compatible subset (same posture as
    * TextOps.scrubPii) so the DuckDB oracle replays them verbatim.
    */
  def classify(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(c === "", "empty")
      .when(c.rlike("^[+-]?[0-9]+$"), "int")
      .when(c.rlike("^[+-]?[0-9]+\\.[0-9]+$"), "num")
      .when(c.rlike("^[0-9]{4}-[0-9]{2}-[0-9]{2}$"), "date")
      .when(c.isin("true", "false"), "bool")
      .otherwise("text")

  /** Per-column inference over dense cells (schema of [[cellRows]]):
    * returns (doc_id, table_idx, j, col_type, n_body, header_type)
    * where col_type is the majority body-cell type (rows i > 1; ties
    * break to the lexicographically smaller type name) and header_type
    * classifies row 1's cell ('none' when the header is narrower than
    * the body). Header-only tables emit no rows — no body, no columns
    * to type.
    */
  def inferColumnTypes(cells: DataFrame): DataFrame = {
    // single pass over the (possibly expensive) upstream cell lineage:
    // body and header counts fold into ONE partial-agg histogram, so
    // the extraction feeding `cells` executes once — a second pass plus
    // a header join would re-run it (measured 23.5 s -> 11 s task-CPU
    // on the sf0.1 suite query)
    val hist = cells.withColumn("ct", classify(col("txt")))
      .groupBy(col("doc_id"), col("table_idx"), col("j"), col("ct"))
      .agg(
        count(when(col("i") > 1, 1)).as("cnt"),
        count(when(col("i") === 1, 1)).as("hcnt"))
    val w = Window.partitionBy("doc_id", "table_idx", "j")
      .orderBy(col("cnt").desc, col("ct").asc)
    hist
      .withColumn("rk", row_number().over(w))
      .groupBy(col("doc_id"), col("table_idx"), col("j"))
      .agg(
        max(when(col("rk") === 1 && col("cnt") > 0, col("ct"))).as("col_type"),
        sum(col("cnt")).as("n_body"),
        coalesce(max(when(col("hcnt") > 0, col("ct"))), lit("none"))
          .as("header_type"))
      // header-only columns (no body cells anywhere) have nothing to
      // type — same exclusion the two-pass formulation had implicitly
      .filter(col("n_body") > 0)
  }
}
