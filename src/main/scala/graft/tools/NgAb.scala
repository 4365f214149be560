package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B the n-gram Jaccard pair stage: member-list expansion (current)
  * vs the window-df + self-join formulation, interleaved in one JVM,
  * noop sink.
  */
object NgAb {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val cpu = new graft.Bench.CpuListener
    spark.sparkContext.addSparkListener(cpu)
    val docs = spark.read.parquet(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1") + "/documents.parquet")
    def run(name: String, df: => org.apache.spark.sql.DataFrame): Unit = {
      val frame = df
      val c0 = cpu.settledCpuNs(); val t0 = System.nanoTime()
      frame.write.format("noop").mode("overwrite").save()
      val w = (System.nanoTime() - t0) / 1e9
      val c = (cpu.settledCpuNs() - c0) / 1e9
      println(f"[ngab] $name%-8s wall=$w%7.3f cpu=$c%8.3f")
    }
    def oldForm = {
      val sh = graft.dedup.Dedup.shingles(docs, "doc_id", "text", 3)
      val filtered = sh
        .withColumn("df", count(lit(1)).over(Window.partitionBy("shingle")))
        .filter(col("df") <= 1000)
        .drop("df")
      val a = filtered.as("a")
      val b = filtered.as("b")
      a.join(b, col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
        .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .agg(count(lit(1)).as("n_common"))
    }
    def newForm = {
      val groups = graft.dedup.Dedup.shingles(docs, "doc_id", "text", 3)
        .groupBy(col("shingle"))
        .agg(collect_list(col("id")).as("ids"))
        .filter(size(col("ids")) >= 2 && size(col("ids")) <= 1000)
        .select(sort_array(col("ids")).as("ids"))
      groups.select(explode(expr(
          """flatten(transform(sequence(0, size(ids) - 2), i ->
            |  transform(sequence(i + 1, size(ids) - 1), j ->
            |    struct(element_at(ids, i + 1) AS id_a,
            |           element_at(ids, j + 1) AS id_b))))""".stripMargin)).as("p"))
        .groupBy(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
        .agg(count(lit(1)).as("n_common"))
    }
    for (_ <- 1 to 4) {
      run("new", newForm)
      run("old", oldForm)
    }
    spark.stop()
  }
}
