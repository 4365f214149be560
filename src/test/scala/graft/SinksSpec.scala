package graft

import graft.sinks.{DebugImage, Html}
import org.scalatest.funsuite.AnyFunSuite

import javax.imageio.ImageIO

class SinksSpec extends AnyFunSuite {

  test("DebugBoxes: offset-ordered JSON, malformed refs skipped (ANSI-safe)") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").appName("graft-sinks-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    val docs = Seq(Doc("d1", Vector(
      Span("word_box", "b", "0.5,0.6,0.1,0.2", 1),
      Span("word_box", "a", "0.1,0.2,0.1,0.2", 0),
      Span("word_box", "bad3", "not,a,box", 2),      // try_cast -> null
      Span("word_box", "bad2", "0.1,0.2,0.3", 3),    // 3 parts
      Span("word_box", "inv", "0.9,0.1,0.1,0.2", 4), // x1 < x0
      Span("text", "skip", "0.1,0.2,0.1,0.2", 5))))
    val got = graft.sinks.DebugBoxes.boxesJson(spark, spark.createDataset(docs).toDF())
      .collect()
    assert(got.length == 1)
    val js = got(0).getAs[String]("boxes_json")
    assert(js ==
      """[{"XLeft":0.1,"XRight":0.2,"YBottom":0.2,"YTop":0.1,"Content":"a"},""" +
      """{"XLeft":0.5,"XRight":0.6,"YBottom":0.2,"YTop":0.1,"Content":"b"}]""")
  }

  test("HTML image-variant renders the reference template shape") {
    val got = Html.fromTableImage(
      Seq(Seq("name", "qty"), Seq("apple", "3")),
      "https://r/img.png", "https://r/t.csv")
    assert(got.startsWith("\n<!DOCTYPE html>\n<html>\n\t<head>"))
    assert(got.contains("Extract Table by Vegard Stikbakke. Go back <a href=\"https://extract-table.com\">home</a>."))
    assert(got.contains("<a href=\"https://r/t.csv\">Download CSV.</a>"))
    assert(got.contains("\t\t<table>\n\t\t\t<tr>\n\t\t\t\t<td>name</td>\n\t\t\t\t<td>qty</td>\n\t\t\t</tr>"))
    assert(got.contains("\n\t\t\t\t<td>apple</td>\n\t\t\t\t<td>3</td>"))
    assert(got.contains("<img src=\"https://r/img.png\">"))
    assert(!got.contains("Original PDF"))
    assert(got.endsWith("</body>\n</html>\n"))
  }

  test("HTML pdf-variant links the original PDF instead of embedding") {
    val got = Html.fromTablePdf(Seq(Seq("a")), "https://r/d.pdf", "https://r/t.csv")
    assert(got.contains("<a href=\"https://r/d.pdf\">Original PDF.</a>"))
    assert(!got.contains("<img"))
  }

  test("HTML cell text is NOT escaped (Go text/template parity)") {
    val got = Html.fromTableImage(Seq(Seq("<b>&amp;</b>")), "i", "c")
    assert(got.contains("<td><b>&amp;</b></td>"))
  }

  test("debug PNG: box outline pixels are red, interior stays white") {
    // 100x100 canvas, box [0.2,0.6]x[0.3,0.5] -> px x 20..60, y 30..50
    val png = DebugImage.renderPng(
      Seq(WordBox("w", 0.2, 0.6, 0.3, 0.5)), 100, 100)
    val img = ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth == 100 && img.getHeight == 100)
    assert(img.getRGB(20, 30) == DebugImage.Red) // top-left corner
    assert(img.getRGB(60, 50) == DebugImage.Red) // bottom-right corner
    assert(img.getRGB(40, 30) == DebugImage.Red) // top edge
    assert(img.getRGB(20, 40) == DebugImage.Red) // left edge
    assert(img.getRGB(40, 40) == 0xFFFFFFFF) // interior untouched
    assert(img.getRGB(5, 5) == 0xFFFFFFFF) // outside untouched
  }

  test("addBoxes overlays outlines on an existing PNG") {
    val base = DebugImage.renderPng(Nil, 50, 50)
    val got = DebugImage.addBoxes(base, Seq(WordBox("w", 0.0, 1.0, 0.0, 1.0)))
    val img = ImageIO.read(new java.io.ByteArrayInputStream(got))
    assert(img.getRGB(0, 0) == DebugImage.Red)
    assert(img.getRGB(25, 25) == 0xFFFFFFFF)
    // x2 = 1.0*50 = 50 is out of bounds -> ignored like Go's img.Set
    assert(img.getRGB(49, 25) == 0xFFFFFFFF)
  }
}
