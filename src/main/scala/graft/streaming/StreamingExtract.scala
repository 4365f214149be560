package graft.streaming

import graft.functions.GraftFunctions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

/** Structured Streaming front-end for the extraction engine.
  *
  * The reference is strictly request/batch (one Lambda invocation per
  * document, cmd/lambda/main.go:29), so streaming is engine scope beyond
  * the reference: a continuously-arriving span table (e.g. a crawl
  * landing zone) is extracted incrementally with exactly-once file-sink
  * semantics via checkpointing. Because the core is one stateless
  * Project (`extract_spans`), it is trivially streaming-safe: no
  * watermark, no state store, every micro-batch is embarrassingly
  * parallel — the same property that makes the batch job resumable.
  */
object StreamingExtract {

  /** Streaming source over a growing directory of span-table parquet. */
  def readSpanStream(spark: SparkSession, inputPath: String, maxFilesPerTrigger: Int = 64): DataFrame = {
    val schema = spark.read.parquet(inputPath).schema
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inputPath)
  }

  /** The extraction transform on a (possibly streaming) span table. */
  def extract(spark: SparkSession, docs: DataFrame): DataFrame =
    GraftFunctions.extractDF(spark, docs)

  /** File-sink writer with checkpointed exactly-once output. */
  def writer(extracted: DataFrame, outPath: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[Row] =
    extracted.writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)

  /** Convenience: run one AvailableNow pass (drain what exists, stop). */
  def runOnce(spark: SparkSession, inputPath: String, outPath: String, checkpoint: String): Unit = {
    val q = writer(extract(spark, readSpanStream(spark, inputPath)), outPath, checkpoint).start()
    q.awaitTermination()
  }
}
