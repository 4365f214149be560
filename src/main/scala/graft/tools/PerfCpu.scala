package graft.tools

/** Round-6 perf triage (not part of the public surface): time named
  * SparkEntry queries with the SAME methodology as graft.Bench — one
  * warmup pass at the sf0.001 sibling, then best-of-2 timed trials at
  * SPARK_GRAFT_SF_DIR — and report wall seconds plus the task-CPU
  * delta of the best trial, so a change's CPU effect is visible even
  * when 32 cores hide it from wall clock.
  * Usage: runMain graft.tools.PerfCpu q_a q_b ...
  */
object PerfCpu {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val trials = sys.env.getOrElse("SPARK_GRAFT_TRIALS", "2").toInt
    val spark = graft.Bench.session(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val cpu = new graft.Bench.CpuListener
    spark.sparkContext.addSparkListener(cpu)
    val warmDir = {
      val sib = new java.io.File(new java.io.File(sfDir).getParent, "sf0.001")
      if (sib.isDirectory) Some(sib.getPath) else None
    }
    for (name <- args) {
      for (wd <- warmDir)
        try graft.SparkEntry.queries(name)(spark, wd).count()
        catch { case _: Throwable => () }
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      var best = Double.MaxValue
      var bestCpu = 0.0
      var rows = -1L
      for (_ <- 1 to trials) {
        val c0 = cpu.settledCpuNs()
        val t0 = System.nanoTime()
        rows = graft.SparkEntry.queries(name)(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        if (sec < best) {
          best = sec
          bestCpu = (cpu.settledCpuNs() - c0) / 1e9
        }
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      println(f"[perfcpu] $name%-26s wall=$best%7.3f s  cpu=$bestCpu%8.3f s  rows=$rows")
    }
    spark.stop()
  }
}
