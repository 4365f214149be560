package graft

import graft.extract.Extract
import org.apache.spark.sql.functions._

/** Temporary perf triage harness (not part of the public surface). */
object QuickPerf {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val inputDir = sys.env.getOrElse("SPARK_GRAFT_INPUT", "/root/repo/target/bench_input/sf0.1_x100")
    val spark = Bench.session(cpus)
    spark.sparkContext.setLogLevel("WARN")
    implicit val enc = org.apache.spark.sql.Encoders.product[Doc]
    implicit val encE = org.apache.spark.sql.Encoders.product[ExtractedDoc]
    implicit val encL = org.apache.spark.sql.Encoders.scalaLong
    def time(label: String)(f: => Long): Unit = {
      f // warmup
      val t0 = System.nanoTime(); val n = f
      println(f"[perf] $label%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    }
    time("scan_count") { spark.read.parquet(inputDir).count() }
    time("scan_decode_count") { spark.read.parquet(inputDir).as[Doc].map(_.spans.length.toLong).reduce(_+_) }
    time("map_no_shuffle") {
      spark.read.parquet(inputDir).as[Doc].mapPartitions(_.map(Extract.extractDoc(_))).filter(_.status=="ok").count()
    }
    time("repartition_only") {
      spark.read.parquet(inputDir).repartition(spark.sparkContext.defaultParallelism*4, pmod(xxhash64(col("doc_id"),lit(16)),lit(spark.sparkContext.defaultParallelism*4))).count()
    }
    time("full_distributed") {
      Extract.distributed(spark, spark.read.parquet(inputDir).as[Doc]).filter(_.status=="ok").count()
    }
    spark.stop()
  }
}
