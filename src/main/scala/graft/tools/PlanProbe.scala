package graft.tools

import graft.SparkEntry

/** Dev-only: print brief formatted plans for queries named in
  * SPARK_GRAFT_PLAN_QUERIES (comma-separated) at sf0.001.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.session("4")
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val names = sys.env.getOrElse("SPARK_GRAFT_PLAN_QUERIES", "").split(",").map(_.trim).filter(_.nonEmpty)
    for (n <- names) {
      println(s"\n===== $n =====")
      println(SparkEntry.queries(n)(spark, sf).queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode))
    }
    spark.stop()
  }
}
