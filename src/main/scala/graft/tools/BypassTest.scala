package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: quantify the BypassMergeSortShuffleWriter cost at R<=200
  * vs the serialized (unsafe) writer, same session shape as Bench.
  * Usage: runMain graft.tools.BypassTest <bypassThreshold> [localDir]
  */
object BypassTest {
  def main(args: Array[String]): Unit = {
    val threshold = args.headOption.getOrElse("200")
    val b = SparkSession.builder()
      .master("local[32]")
      .appName("bypass-test")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.shuffle.sort.bypassMergeThreshold", threshold)
    val b2 = if (args.length > 1) b.config("spark.local.dir", args(1)) else b
    val spark = b2.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cpu = new graft.Bench.CpuListener
    spark.sparkContext.addSparkListener(cpu)
    def time(label: String)(f: => Long): Unit = {
      f
      val c0 = cpu.settledCpuNs(); val t0 = System.nanoTime()
      val n = f
      println(f"[bt] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  cpu=${(cpu.settledCpuNs() - c0) / 1e9}%7.2f s  rows=$n")
    }
    val cp = spark.range(120000).select((col("id") % 5000).as("doc_id"))
      .repartition(128).localCheckpoint()
    time(s"counts thr=$threshold")(cp.groupBy(col("doc_id")).agg(count(lit(1)).as("n")).count())
    time(s"counts2 thr=$threshold")(cp.groupBy(col("doc_id")).agg(count(lit(1)).as("n")).count())
    spark.stop()
  }
}
