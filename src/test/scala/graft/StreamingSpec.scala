package graft

import graft.extract.Extract
import graft.fixtures.SpanGen
import graft.streaming.StreamingExtract
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Streaming extraction: an AvailableNow pass over a span-table
  * directory must produce exactly the batch output, and a second file
  * arriving must be picked up incrementally (checkpointed offsets).
  */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-streaming-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("AvailableNow drain equals batch output; increments are incremental") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-stream").toString
    val in = base + "/in"
    val out = base + "/out"
    val ckpt = base + "/ckpt"

    val batch1 = SpanGen.genDocs(30, seed = 3L)
    spark.createDataset(batch1.map(_._1)).toDF()
      .write.mode(SaveMode.Append).parquet(in)
    StreamingExtract.runOnce(spark, in, out, ckpt)

    val got1 = spark.read.parquet(out)
      .select("doc_id", "spans").as[(String, Seq[Span])].collect().toMap
    assert(got1.size == 30)
    for ((doc, golden) <- batch1) assert(got1(doc.doc_id) == golden, doc.doc_id)

    // second file lands; only the delta is processed on the next pass
    val batch2 = SpanGen.genDocs(10, seed = 1003L).map { case (d, g) =>
      (Doc("b2-" + d.doc_id, d.spans), g)
    }
    spark.createDataset(batch2.map(_._1)).toDF()
      .write.mode(SaveMode.Append).parquet(in)
    StreamingExtract.runOnce(spark, in, out, ckpt)

    val got2 = spark.read.parquet(out)
      .select("doc_id", "spans").as[(String, Seq[Span])].collect().toMap
    assert(got2.size == 40)
    for ((doc, golden) <- batch2) assert(got2(doc.doc_id) == golden, doc.doc_id)

    // and the combined streaming output equals the batch path
    val allDocs = spark.createDataset((batch1 ++ batch2).map(_._1))
    val batchOut = Extract.run(allDocs).collect()
      .map(d => d.doc_id -> d.spans).toMap
    assert(got2 == batchOut)
  }
}
