package graft.tools

import java.nio.file.{Files, Paths}

/** Round-6 deliverable helper: dump .explain("formatted") for named
  * SparkEntry queries into plans/r06/<query>_<tag>.txt.
  * Usage: runMain graft.tools.PlanR06 <tag> q_a q_b ...
  */
object PlanR06 {
  def main(args: Array[String]): Unit = {
    val tag = args.head
    val names = args.tail
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get("/root/repo/plans/r06"))
    for (name <- names) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val p = Paths.get(s"/root/repo/plans/r06/${name}_$tag.txt")
      Files.writeString(p, txt)
      println(s"wrote $p")
    }
    spark.stop()
  }
}
