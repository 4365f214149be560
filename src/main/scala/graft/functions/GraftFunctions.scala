package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.{call_function, col, expr, regexp_replace, trim}
import org.apache.spark.sql.SparkSessionExtensions

/** Registration and Column-level API for the engine's native Catalyst
  * expressions.
  */
object GraftFunctions {

  val Builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "extract_spans" -> (exprs => ExtractSpansExpr(exprs.head, useSplitHeuristic = false)),
    "extract_spans_split" -> (exprs => ExtractSpansExpr(exprs.head, useSplitHeuristic = true)),
    "extract_spans_split_mid" -> (exprs =>
      ExtractSpansExpr(exprs.head, useSplitHeuristic = true, useMidpoint = true)),
    "simhash60" -> (exprs => Simhash60Expr(exprs.head)),
    "nfc_norm" -> (exprs => NfcNormalizeExpr(exprs.head)),
    "html_main_content" -> (exprs => HtmlMainContentExpr(exprs.head)),
    "bpe_count" -> (exprs => BpeCountExpr(exprs(0), exprs(1))),
    "topk_longs" -> (exprs => TopKLongsAgg(exprs(0), exprs(1))),
    "jaro_winkler" -> (exprs => JaroWinklerExpr(exprs(0), exprs(1))))

  /** Trained-BPE token count Column over `text` — the merge table rides
    * as an in-plan literal so the registry builder stays stateless.
    */
  def bpeCount(spark: SparkSession, text: Column,
      codec: graft.textops.BpeCodec): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("bpe_count", text,
      org.apache.spark.sql.functions.typedLit(codec.packed))
  }

  /** Unicode NFC canonical composition (native expression). */
  def nfcNorm(spark: SparkSession, text: Column): Column = {
    register(spark)
    call_function("nfc_norm", text)
  }

  /** Jaro-Winkler similarity (native expression; DuckDB
    * `jaro_winkler_similarity` byte-level parity).
    */
  def jaroWinkler(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("jaro_winkler", a, b)
  }

  /** C4-style text normalization: NFC composition, control characters
    * stripped (tab and newline survive as whitespace), NBSP folded to
    * space, space/tab runs collapsed to one space, ends trimmed. Every
    * step after the NFC expression is a codegen'd regexp_replace whose
    * pattern is in the RE2-compatible subset the DuckDB oracle replays
    * verbatim (same posture as TextOps.scrubPii).
    */
  def normalizeText(spark: SparkSession, text: Column): Column = {
    val composed = nfcNorm(spark, text)
    val noCtl = regexp_replace(composed, "[\\x00-\\x08\\x0B-\\x1F\\x7F]", "")
    val noNbsp = regexp_replace(noCtl, "\\x{00A0}", " ")
    trim(regexp_replace(noNbsp, "[ \\t]+", " "))
  }

  /** Session-scoped registration (tests, local jobs). */
  def register(spark: SparkSession): Unit =
    Builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }

  /** The full extraction as one Project over the span table:
    * (doc_id, spans) -> (doc_id, spans, n_tables, n_cells, status).
    */
  def extractDF(spark: SparkSession, df: DataFrame, split: Boolean = false,
      midpoint: Boolean = false): DataFrame = {
    register(spark)
    val fn =
      if (split && midpoint) "extract_spans_split_mid"
      else if (split) "extract_spans_split"
      else "extract_spans"
    df.select(col("doc_id"), expr(s"$fn(spans)").as("ex"))
      .select(col("doc_id"), col("ex.spans").as("spans"),
        col("ex.n_tables").as("n_tables"), col("ex.n_cells").as("n_cells"),
        col("ex.status").as("status"))
  }
}

/** Cluster deployment hook:
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions` makes
  * extract_spans available in every session without code access.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.Builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.ExtractSpansExpr", name),
        builder))
    }
    // no-op until spark.graft.rangeJoin.width is set, so global
    // injection is safe
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRule)
    // plans the PointIntervalJoin logical node (stage-(c) custom
    // operator); matches nothing else, so global injection is safe
    ext.injectPlannerStrategy(_ => graft.plans.PointIntervalJoinStrategy)
  }
}
