package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.AtomicLong

/** Child entry for ScalingBench: one warmup + one measured extraction in
  * a fresh JVM, result on stdout as "RESULT <seconds> <rows>", plus a
  * "METRICS runMs cpuMs gcMs deserMs" line from Spark task metrics for
  * the measured run (stall diagnosis: cpuMs << runMs means tasks waited
  * on something other than the CPU) and a "DRIVERMEM start/peak/end"
  * line sampled across the measured run (local mode shares the heap
  * with executors, so the meaningful flat-memory signal is settled
  * start-vs-end usage after a forced GC — a driver-side accumulation
  * scaling with input size would survive the GC and show there).
  */
object BenchOne {
  private def settledUsedMb(): Long = {
    System.gc()
    Thread.sleep(200)
    val rt = Runtime.getRuntime
    (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
  }

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
    val memStart = settledUsedMb()
    val peakMb = new AtomicLong(memStart)
    val sampler = new Thread(() => {
      val rt = Runtime.getRuntime
      // no `return` in this lambda: it would compile to a
      // NonLocalReturnControl thrown on the sampler thread with no
      // frame to land in (uncaught-handler noise on every run)
      var live = true
      while (live && !Thread.currentThread().isInterrupted) {
        val used = (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
        peakMb.getAndUpdate(p => math.max(p, used))
        try Thread.sleep(250) catch { case _: InterruptedException => live = false }
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    val (sec, rows) = Bench.timeExtract(spark, inputDir)
    sampler.interrupt()
    val memEnd = settledUsedMb()
    println(s"RESULT $sec $rows")
    println(s"METRICS run=${runMs.get}ms cpu=${cpuNs.get / 1000000}ms gc=${gcMs.get}ms taskDeser=${deserMs.get}ms")
    println(s"DRIVERMEM start=${memStart}MB peak=${peakMb.get}MB end=${memEnd}MB")
    spark.stop()
  }
}
