package graft.tools

/** Temporary perf triage (not part of the public surface): time named
  * SparkEntry queries cold then warm at bench config.
  * Usage: runMain graft.tools.QueryPerf q_a q_b ...
  */
object QueryPerf {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Bench.session(cpus)
    spark.sparkContext.setLogLevel("WARN")
    for (name <- args; pass <- Seq("cold", "warm")) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[perf] $name%-24s $pass%-5s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    spark.stop()
  }
}
