package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch profiler for PrefixJoin.prefixJaccardPairs internals (not graded). */
object PjProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val cpu = new graft.Bench.CpuListener
    spark.sparkContext.addSparkListener(cpu)
    def time(label: String)(f: => Long): Unit = {
      val c0 = cpu.settledCpuNs(); val t0 = System.nanoTime()
      val n = f
      println(f"[pj] $label%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s  cpu=${(cpu.settledCpuNs() - c0) / 1e9}%7.2f s  rows=$n")
    }
    val threshold = 0.15
    val docs = spark.read.parquet(sfDir + "/documents.parquet")
      .filter(col("doc_id") < 2000)
    val sh = graft.dedup.Dedup.shingles(docs, "doc_id", "text", 3)
    time("shingles")(sh.count())
    val docFreq = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    time("docfreq")(docFreq.count())
    val byRarity = Window.partitionBy("id").orderBy(col("df"), col("shingle"))
    val pos = sh.join(docFreq, "shingle")
      .withColumn("r", row_number().over(byRarity))
      .withColumn("sz", count(lit(1)).over(Window.partitionBy("id")))
    def ceilT(szCol: org.apache.spark.sql.Column) =
      ceil(szCol * lit(threshold) - lit(1e-9))
    val pref = pos.filter(col("r") <= col("sz") - ceilT(col("sz")) + 1)
      .select(col("id"), col("shingle"), col("sz"), col("r"))
    time("prefix_rows")(pref.count())
    val a = pref.as("a"); val b = pref.as("b")
    val raw = a.join(b,
      col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id") &&
        col("b.sz") >= ceilT(col("a.sz")) && col("a.sz") >= ceilT(col("b.sz")))
    time("raw_cand")(raw.count())
    // positional filter: overlap upper bound from the matched prefix
    // positions must reach the equivalent-overlap requirement
    val alpha = ceil((col("a.sz") + col("b.sz")) * lit(threshold / (1 + threshold)) - lit(1e-9))
    val rawPos = raw.filter(
      least(col("a.sz") - col("a.r"), col("b.sz") - col("b.r")) + 1 >= alpha)
    time("raw_cand_pos")(rawPos.count())
    time("cand_distinct")(raw.select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct().count())
    time("cand_pos_distinct")(rawPos.select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct().count())
    val out = graft.dedup.PrefixJoin.prefixJaccardPairs(docs, "doc_id", "text", 3, threshold)
    time("full")(out.count())
    spark.stop()
  }
}
