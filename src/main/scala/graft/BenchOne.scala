package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.AtomicLong

/** Child entry for ScalingBench: one warmup + one measured extraction in
  * a fresh JVM, result on stdout as "RESULT <seconds> <rows>", plus a
  * "METRICS runMs cpuMs gcMs deserMs" line from Spark task metrics for
  * the measured run (stall diagnosis: cpuMs << runMs means tasks waited
  * on something other than the CPU).
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val Array(cpus, inputDir) = args
    val spark = Bench.session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val runMs = new AtomicLong
    val cpuNs = new AtomicLong
    val gcMs = new AtomicLong
    val deserMs = new AtomicLong
    Bench.timeExtract(spark, inputDir) // warmup
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          runMs.addAndGet(m.executorRunTime)
          cpuNs.addAndGet(m.executorCpuTime)
          gcMs.addAndGet(m.jvmGCTime)
          deserMs.addAndGet(m.executorDeserializeTime)
        }
      }
    })
    val (sec, rows) = Bench.timeExtract(spark, inputDir)
    println(s"RESULT $sec $rows")
    println(s"METRICS run=${runMs.get}ms cpu=${cpuNs.get / 1000000}ms gc=${gcMs.get}ms taskDeser=${deserMs.get}ms")
    spark.stop()
  }
}
