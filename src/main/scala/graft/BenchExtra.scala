package graft

/** Extra (non-graded) benchmark: time a named subset of SparkEntry
  * queries in isolation — same session shape, same warmup discipline and
  * same best-of-N methodology as [[Bench]], but scoped to the queries
  * under investigation so a measurement is not colored by the 270-query
  * suite's interleaving (guide §1.4: isolate what you time).
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.BenchExtra q_ann_neardup q_prefix_join"
  *
  * Optional env:
  *   SPARK_GRAFT_TRIALS  timed trials per query (default 3)
  *   SPARK_GRAFT_NOOP=1  drive each query through the noop sink instead
  *                       of count() (forces every column of every row)
  *
  * Cited in OPTIMIZATION_r06.md; never graded — Bench.scala is the
  * frozen driver contract and is untouched by this main.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val trials = scala.util.Try(
      sys.env.getOrElse("SPARK_GRAFT_TRIALS", "3").toInt).getOrElse(3)
    val noop = sys.env.get("SPARK_GRAFT_NOOP").contains("1")
    val names =
      if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")

    val spark = Bench.session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val cpuListener = new Bench.CpuListener
    spark.sparkContext.addSparkListener(cpuListener)

    val warmDir = {
      val sib = new java.io.File(new java.io.File(sfDir).getParent, "sf0.001")
      if (sib.isDirectory) sib.getPath else sfDir
    }
    def run(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
        dir: String): Long =
      if (noop) {
        fn(spark, dir).write.format("noop")
          .mode(org.apache.spark.sql.SaveMode.Overwrite).save()
        -1L
      } else fn(spark, dir).count()

    for (name <- names) {
      val fn = SparkEntry.queries(name)
      spark.sparkContext.setJobDescription(s"warmup:$name")
      scala.util.Try(run(fn, warmDir))
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      var best = Double.MaxValue
      var bestCpu = 0.0
      var rows = -1L
      val samples = Array.fill(trials)(0.0)
      for (t <- 0 until trials) {
        spark.sparkContext.setJobDescription(s"$name trial $t")
        val c0 = cpuListener.settledCpuNs()
        val t0 = System.nanoTime()
        rows = run(fn, sfDir)
        val sec = (System.nanoTime() - t0) / 1e9
        samples(t) = sec
        if (sec < best) {
          best = sec
          bestCpu = (cpuListener.settledCpuNs() - c0) / 1e9
        }
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      println(f"[extra] $name%-28s best=$best%8.3f s  cpu=$bestCpu%8.3f s  rows=$rows  samples=${samples.map(s => f"$s%.3f").mkString(",")}  load=${Bench.loadavg1m()}%.2f")
    }
    spark.stop()
  }
}
