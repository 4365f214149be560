package graft

import java.nio.file.{Files, Paths}

/** Scaling-efficiency evidence for the north_rule's two-cluster-size
  * criterion: no real cluster exists in this sandbox, so the identical
  * job (same input parquet, shuffle partitions matched to cores) runs at
  * local[N] and local[4N] and we report throughput at both plus
  * efficiency (docs_per_sec@4N) / (4 * docs_per_sec@N).
  *
  * Each measurement runs in a FRESH child JVM: sequential SparkSessions
  * inside one JVM contaminate each other (code-cache and heap aging were
  * measured to degrade later trials by 2-5x), so the parent only
  * orchestrates. Best-of-k per level is the throughput estimator — the
  * sandbox host shows hypervisor noise, and noise only ever adds time.
  */
object ScalingBench {

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  def childRun(cpus: Int, inputDir: String): (Double, Long, Long, String) = {
    val java = System.getProperty("java.home") + "/bin/java"
    val mem = sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")
    val cmd = Seq(java) ++ addOpens ++ Seq(
      // fixed, pre-touched heap: lazy heap commit page-faults during the
      // measured region on this kernel and G1 regrowth adds 2-5x noise.
      // G1NewSizePercent=40: the pipeline is allocation-heavy (per-doc
      // output arrays) with almost nothing long-lived, and G1's default
      // 5% young gen forces survivor churn that measured as 26s of GC
      // task-time at local[32] (down to <2s young-sized; wall 9.2->6.3s)
      s"-Xmx$mem", s"-Xms$mem", "-XX:+AlwaysPreTouch",
      "-XX:+UnlockExperimentalVMOptions", "-XX:G1NewSizePercent=40",
      "-Dspark.ui.enabled=false",
      "-cp", System.getProperty("java.class.path"),
      "graft.BenchOne", cpus.toString, inputDir)
    val pb = new ProcessBuilder(cmd: _*)
    // stderr must not backpressure the child (Spark logs are chatty)
    pb.redirectError(ProcessBuilder.Redirect.DISCARD)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    proc.waitFor()
    val line = out.linesIterator.find(_.startsWith("RESULT ")).getOrElse(
      sys.error(s"child produced no RESULT line:\n$out"))
    val Array(_, sec, rows) = line.split(' ')
    // task-CPU total of the measured run ("METRICS run=..ms cpu=<n>ms ..")
    val cpuMs = out.linesIterator.find(_.startsWith("METRICS "))
      .flatMap(_.split(' ').find(_.startsWith("cpu=")))
      .map(_.stripPrefix("cpu=").stripSuffix("ms").toLong)
      .getOrElse(0L)
    val memLine = out.linesIterator.find(_.startsWith("DRIVERMEM "))
      .map(_.stripPrefix("DRIVERMEM ")).getOrElse("unavailable")
    (sec.toDouble, rows.toLong, cpuMs, memLine)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicate = sys.env.getOrElse("SPARK_GRAFT_REPLICATE", "100").toInt
    val n = sys.env.getOrElse("SPARK_GRAFT_N", "4").toInt
    val trials = sys.env.getOrElse("SPARK_GRAFT_TRIALS", "3").toInt

    val prep = Bench.session("8")
    prep.sparkContext.setLogLevel("WARN")
    val (inputDir, nDocs) = Bench.materializeInput(prep, sfDir, replicate)
    prep.stop()

    var secN = Double.MaxValue
    var sec4N = Double.MaxValue
    var okN = 0L
    var ok4N = 0L
    var cpuN = 0L
    var cpu4N = 0L
    var mem4N = "unavailable"
    for (t <- 1 to trials) {
      val (sN, oN, cN, _) = childRun(n, inputDir)
      val (s4, o4, c4, m4) = childRun(4 * n, inputDir)
      System.err.println(f"[scaling] trial $t: local[$n]=$sN%.2fs local[${4 * n}]=$s4%.2fs")
      if (sN < secN) { secN = sN; okN = oN; cpuN = cN }
      if (s4 < sec4N) { sec4N = s4; ok4N = o4; cpu4N = c4; mem4N = m4 }
    }
    require(okN == ok4N, s"row counts diverged: $okN vs $ok4N")
    val dpsN = okN / secN
    val dps4N = ok4N / sec4N
    val eff = dps4N / (4.0 * dpsN)
    val cpuInfl = if (cpuN > 0 && cpu4N > 0) cpu4N.toDouble / cpuN else Double.NaN

    // Interpretation is gated on the measured value — the raw number is
    // always printed, but the memory-bandwidth reading only attaches when
    // on-CPU time genuinely inflated (>1.2x). On-CPU inflation can also
    // come from frequency down-clocking at high core counts; the
    // single-host-vs-cluster caveat lives as prose in BENCH.md, not as a
    // generated causal claim.
    val inflLine =
      if (cpuInfl.isNaN)
        "Task-CPU inflation at 4N: unavailable (child emitted no METRICS line)."
      else if (cpuInfl > 1.2)
        f"""Task-CPU inflation at 4N (same work, ThreadMXBean on-CPU time):
           |**$cpuInfl%.2fx** — significant; consistent with contention for a
           |shared per-socket resource (memory bandwidth or clock headroom) that
           |a multi-node 4N-executor cluster would not share.""".stripMargin
      else
        f"""Task-CPU inflation at 4N (same work, ThreadMXBean on-CPU time):
           |**$cpuInfl%.2fx** — not significant; the two runs executed the same
           |cycles, so this pair sits below any shared-resource wall.""".stripMargin

    val report =
      f"""
         |## Measured scaling run (${java.time.Instant.now()})
         |
         || config | docs | wall (s) | docs/sec | task-CPU total (s) |
         ||---|---|---|---|---|
         || local[$n], shuffle.partitions=$n | $nDocs | $secN%.2f | $dpsN%.0f | ${cpuN / 1000.0}%.1f |
         || local[${4 * n}], shuffle.partitions=${4 * n} | $nDocs | $sec4N%.2f | $dps4N%.0f | ${cpu4N / 1000.0}%.1f |
         |
         |Scaling efficiency N=$n -> 4N=${4 * n}: **$eff%.3f** (target >= 0.8).
         |Driver heap across the best 4N run (settled, post-GC): $mem4N —
         |local mode shares the heap with executor threads, so "flat" means
         |start-vs-end usage does not grow with input size (nothing
         |accumulates on the driver).
         |$inflLine
         |Input: $inputDir (sf=$sfDir, replicate=$replicate); sink=${
           sys.env.getOrElse("SPARK_GRAFT_SINK", "parquet")}; best of $trials
         |trials per level, each trial a fresh JVM (warmup run + measured run).
         |""".stripMargin

    val benchMd = Paths.get("/root/repo/BENCH.md")
    val existing = if (Files.exists(benchMd)) Files.readString(benchMd) else
      "# BENCH — measured performance of the graft engine\n\nSee BASELINE.md for the reference's (absent) numbers and the target\nmetrics. Each section below is one `graft.ScalingBench` run.\n"
    Files.writeString(benchMd, existing + report)
    println(f"""{"n":$n,"docs":$nDocs,"docs_per_sec_n":$dpsN%.1f,"docs_per_sec_4n":$dps4N%.1f,"efficiency":$eff%.3f}""")
  }
}
