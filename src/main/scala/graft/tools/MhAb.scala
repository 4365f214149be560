package graft.tools

/** A/B the MinHash signature stage: native expression vs the aggregate
  * formulation, interleaved in one JVM, noop sink (guide §1.4).
  */
object MhAb {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val cpu = new graft.Bench.CpuListener
    spark.sparkContext.addSparkListener(cpu)
    val docs = spark.read.parquet(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1") + "/documents.parquet")
    def run(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val c0 = cpu.settledCpuNs(); val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val w = (System.nanoTime() - t0) / 1e9
      val c = (cpu.settledCpuNs() - c0) / 1e9
      println(f"[mhab] $name%-8s wall=$w%7.3f cpu=$c%8.3f")
    }
    for (_ <- 1 to 4) {
      run("native", graft.dedup.Dedup.minhashSignatures(docs, "doc_id", "text", 3, 64))
      run("agg", graft.dedup.Dedup.minhashSignaturesAgg(docs, "doc_id", "text", 3, 64))
    }
    spark.stop()
  }
}
