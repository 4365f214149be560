package graft

import graft.functions.GraftFunctions
import graft.operators.SpanDiff
import graft.sinks.Markdown
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Span-sequence diff, markdown table sink, NFC/C4 normalization. */
class SpanDiffSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-spandiff-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def spans(rows: (String, Int, String, String, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("id", "pos", "kind", "text", "media_ref")
  }

  private val payload = Seq("kind", "text", "media_ref")

  test("diff reports equal, value-divergence, shorter and longer sequences") {
    val a = spans(
      ("same", 0, "text", "x", ""), ("same", 1, "cell", "y", "1,1"),
      ("val", 0, "text", "x", ""), ("val", 1, "cell", "y", "1,1"),
      ("short", 0, "text", "x", ""), ("short", 1, "text", "y", ""),
      ("long", 0, "text", "x", ""))
    val b = spans(
      ("same", 0, "text", "x", ""), ("same", 1, "cell", "y", "1,1"),
      ("val", 0, "text", "x", ""), ("val", 1, "cell", "Y", "1,1"),
      ("short", 0, "text", "x", ""),
      ("long", 0, "text", "x", ""), ("long", 1, "text", "EXTRA", ""))
    val out = SpanDiff.diff(a, b, "id", "pos", payload).collect()
      .map(r => r.getString(0) ->
        ((if (r.isNullAt(1)) -1 else r.getInt(1)), r.getLong(2), r.getLong(3),
          r.getString(4))).toMap
    assert(out("same") == ((-1, 2L, 2L, "equal")))
    assert(out("val") == ((1, 2L, 2L, "diverged")))
    assert(out("short") == ((1, 2L, 1L, "diverged")))
    assert(out("long") == ((1, 1L, 2L, "diverged")))
  }

  test("diff covers docs present on only one side") {
    val a = spans(("onlyA", 0, "text", "x", ""))
    val b = spans(("onlyB", 0, "text", "x", ""))
    val out = SpanDiff.diff(a, b, "id", "pos", payload).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getString(4)))
      .toMap
    assert(out("onlyA") == ((1L, 0L, "diverged")))
    assert(out("onlyB") == ((0L, 1L, "diverged")))
  }

  test("markdown serializes header, separator, rows with escaping") {
    val md = Markdown.fromTable(Seq(
      Seq("h1", "h|2"),
      Seq("a\nb", "c")))
    assert(md ==
      "| h1 | h\\|2 |\n| --- | --- |\n| a<br>b | c |")
    assert(Markdown.fromTable(Nil) == "")
    // single-row table: header + separator, no body
    assert(Markdown.fromTable(Seq(Seq("x"))) == "| x |\n| --- |")
  }

  test("normalizeText composes NFC, strips controls, folds NBSP, collapses runs") {
    import spark.implicits._
    def norm(s: String): String =
      Seq(s).toDF("t")
        .select(GraftFunctions.normalizeText(spark, col("t")).as("n"))
        .as[String].head()
    assert(norm("café") == "café")     // combining acute composes
    assert(norm("ab") == "ab")              // control stripped
    assert(norm("a b") == "a b")             // NBSP folds to space
    assert(norm(" \t a \t\t b  ") == "a b")       // runs collapse, ends trim
    assert(norm("café") == "café")      // already-NFC passes through
    // newlines survive (they are structure, not padding)
    assert(norm("a\nb") == "a\nb")
  }

  test("nfc_norm stays inside whole-stage codegen") {
    import spark.implicits._
    // non-literal input: a foldable child would let Catalyst evaluate
    // the expression at plan time and hide the codegen path entirely
    val df = spark.range(1)
      .select(concat(lit("café"), col("id").cast("string")).as("t"))
      .select(GraftFunctions.nfcNorm(spark, col("t")).as("n"))
    // "*(1)" is the whole-stage-codegen stage marker: the Project
    // holding nfc_norm compiled into the same generated stage as Range
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [nfc_norm"), s"plan:\n$plan")
    assert(df.as[String].head() == "café0")
  }
}
