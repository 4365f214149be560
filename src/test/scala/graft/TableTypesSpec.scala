package graft

import graft.corpus.Interleave
import graft.extract.TableTypes
import graft.textops.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Interleave profile, table column typing, script-mix detection. */
class TableTypesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-tabletypes-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("interleave profile counts kinds, switches, first/last") {
    import spark.implicits._
    val sp = Seq(
      ("d1", 0, "text"), ("d1", 1, "word_box"), ("d1", 2, "word_box"),
      ("d1", 3, "media"), ("d1", 4, "text"),
      ("d2", 0, "media")).toDF("doc_id", "offset", "kind")
    val out = Interleave.profile(sp, "doc_id", "offset", "kind")
      .orderBy("doc_id").collect()
    // d1: 5 spans, 2 text, 2 word_box, 1 media, switches at 1,3,4 = 3
    assert(out(0).toSeq == Seq("d1", 5L, 2L, 2L, 1L, 3L, "text", "text"))
    assert(out(1).toSeq == Seq("d2", 1L, 0L, 0L, 1L, 0L, "media", "media"))
  }

  test("classify covers every branch") {
    import spark.implicits._
    val out = Seq("", "42", "-7", "3.14", "2024-01-05", "true", "false",
        "word", "1.2.3", "2024-1-5")
      .toDF("c").select(TableTypes.classify(col("c")).as("t"))
      .as[String].collect().toSeq
    assert(out == Seq("empty", "int", "int", "num", "date", "bool", "bool",
      "text", "text", "text"))
  }

  test("majority vote, tie-break, and narrow header") {
    import spark.implicits._
    // table 0: col 1 body = int,int,text -> int; col 2 body = int,text +
    // no third cell (ragged) -> tie int/text breaks to 'int'; col 3 has
    // body cells but no header cell -> header_type 'none'
    val cells = Seq(
      ("d", 0, 1, 1, "h1"), ("d", 0, 1, 2, "h2"),
      ("d", 0, 2, 1, "1"), ("d", 0, 2, 2, "2"), ("d", 0, 2, 3, "x"),
      ("d", 0, 3, 1, "3"), ("d", 0, 3, 2, "y"), ("d", 0, 3, 3, "z"),
      ("d", 0, 4, 1, "w"),
      // table 1: header-only -> emits no rows
      ("d", 1, 1, 1, "only")).toDF("doc_id", "table_idx", "i", "j", "txt")
    val out = TableTypes.inferColumnTypes(cells).orderBy("table_idx", "j")
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getString(3),
        r.getLong(4), r.getString(5))).toSeq
    assert(out == Seq(
      (0, 1, "int", 3L, "text"),
      (0, 2, "int", 2L, "text"),
      (0, 3, "text", 2L, "none")))
  }

  test("code detection: symbol density and indentation both vote") {
    import spark.implicits._
    val code = "def f(x) {\n\ty = x + 1;\n\treturn (y);\n}"
    val prose = "this is a plain sentence with many ordinary words in it"
    val indentedProse = "  a\n  b\n  c\nplain" // 3/4 indented -> code-like
    val rows = Seq(code, prose, indentedProse).toDF("t")
      .select(
        graft.textops.TextOps.codeSymbolCount(col("t")).as("s"),
        graft.textops.TextOps.indentedLineCount(col("t")).as("i"),
        graft.textops.TextOps.isCodeLike(col("t")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(rows(0)._1 == 9 && rows(0)._2 == 2 && rows(0)._3)
    assert(rows(1) == ((0L, 0L, false)))
    assert(rows(2)._3)
  }

  test("script counts and dominant vote") {
    import spark.implicits._
    val df = Seq("abc где 42", "中文 x", "", "где 中文文")
      .toDF("t")
      .select(
        TextOps.scriptCount(col("t"), "Latin").as("lat"),
        TextOps.scriptCount(col("t"), "Cyrillic").as("cyr"),
        TextOps.scriptCount(col("t"), "Han").as("han"))
      .withColumn("s",
        TextOps.dominantScript(col("lat"), col("cyr"), col("han")))
    val rows = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(rows == Seq(
      (3L, 3L, 0L, "cyrillic"), // tie lat/cyr -> alphabetical cyrillic
      (1L, 0L, 2L, "han"),
      (0L, 0L, 0L, "none"),
      (0L, 3L, 3L, "cyrillic")))
  }
}
