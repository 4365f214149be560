package graft.tools

import org.apache.spark.scheduler._
import scala.collection.concurrent.TrieMap

/** Round-6 triage: run one SparkEntry query and print every Spark job's
  * wall time + first stage callsite, to see where latency-bound queries
  * spend their serial time. Usage: runMain graft.tools.JobProf q_name
  */
object JobProf {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Bench.session(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val starts = TrieMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = j.stageInfos.headOption.map(_.details.linesIterator
          .filter(l => l.contains("graft") || l.contains("Dataset"))
          .take(1).mkString).getOrElse("")
        starts(j.jobId) = (System.nanoTime(),
          j.stageInfos.map(s => s.name.take(60)).mkString(" | ").take(180) +
            " @ " + site.take(80))
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val si = s.stageInfo
        val ms = (for (a <- si.completionTime; b <- si.submissionTime) yield a - b)
          .getOrElse(-1L)
        if (ms > 200) println(f"[stage] ${si.stageId}%4d ${ms}%7d ms tasks=${si.numTasks}%4d ${si.name.take(90)}")
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        starts.remove(j.jobId).foreach { case (t0, name) =>
          val ms = (System.nanoTime() - t0) / 1e6
          if (ms > 20) println(f"[job] ${j.jobId}%4d ${ms}%8.0f ms  $name")
        }
      }
    })
    for (name <- args) {
      // warmup at sf0.001 to strip JIT noise, as the bench does
      try graft.SparkEntry.queries(name)(spark,
        new java.io.File(new java.io.File(sfDir).getParent, "sf0.001").getPath).count()
      catch { case _: Throwable => () }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      Thread.sleep(500)
      println(s"==== $name timed run ====")
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
      println(f"==== $name total ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n ====")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
