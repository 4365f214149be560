package graft.tools

import org.apache.spark.sql.functions._

/** Scratch profiler for the interleave/span fixture paths (not graded). */
object IlProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val cpu = new graft.Bench.CpuListener
    spark.sparkContext.addSparkListener(cpu)
    def time(label: String)(f: => Long): Unit = {
      f // warm
      val c0 = cpu.settledCpuNs(); val t0 = System.nanoTime()
      val n = f
      println(f"[il] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  cpu=${(cpu.settledCpuNs() - c0) / 1e9}%7.2f s  rows=$n")
    }
    import graft.fixtures.SpanGen
    time("spangen_docs")(SpanGen.fromDocuments(spark, sfDir).count())
    val exploded = SpanGen.fromDocuments(spark, sfDir).toDF()
      .select(col("doc_id"), explode(col("spans")).as("sp"))
      .select(col("doc_id"), col("sp.offset").as("offset"), col("sp.kind").as("kind"))
    time("exploded")(exploded.count())
    time("exploded_noop") { exploded.write.format("noop").mode("overwrite").save(); -1L }
    time("profile")(graft.corpus.Interleave.profile(exploded, "doc_id", "offset", "kind").count())
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("offset")
    val lagged = exploded.withColumn("__prev", lag(col("kind"), 1).over(w))
    time("lag_only")(lagged.count())
    time("lag_counts")(lagged.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n"),
      count(when(col("kind") === "text", 1)).as("nt"),
      count(when(col("__prev").isNotNull && col("__prev") =!= col("kind"), 1)).as("sw")).count())
    time("lag_minby")(lagged.groupBy(col("doc_id")).agg(
      min_by(col("kind"), col("offset")).as("fk"),
      max_by(col("kind"), col("offset")).as("lk")).count())
    time("counts_only")(exploded.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n")).count())
    time("minby_only")(exploded.groupBy(col("doc_id")).agg(
      min_by(col("kind"), col("offset")).as("fk")).count())
    val cp = exploded.localCheckpoint()
    time("cp_noop_128tasks") { cp.write.format("noop").mode("overwrite").save(); -1L }
    time("counts_on_cp")(cp.groupBy(col("doc_id")).agg(count(lit(1)).as("n")).count())
    time("counts_on_cp_coal32")(cp.coalesce(32).groupBy(col("doc_id")).agg(count(lit(1)).as("n")).count())
    val cp32 = exploded.repartition(32).localCheckpoint()
    time("counts_on_cp32")(cp32.groupBy(col("doc_id")).agg(count(lit(1)).as("n")).count())
    val cp8 = exploded.repartition(8).localCheckpoint()
    time("counts_on_cp8")(cp8.groupBy(col("doc_id")).agg(count(lit(1)).as("n")).count())
    spark.conf.set("spark.sql.shuffle.partitions", "256")
    time("counts_on_cp_sp256")(cp.groupBy(col("doc_id")).agg(count(lit(1)).as("n")).count())
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("counts_on_cp_noaqe")(cp.groupBy(col("doc_id")).agg(count(lit(1)).as("n")).count())
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    for (sp <- Seq("64", "128", "199", "201", "64")) {
      spark.conf.set("spark.sql.shuffle.partitions", sp)
      time(s"counts_on_cp_sp$sp")(cp.groupBy(col("doc_id")).agg(count(lit(1)).as("n")).count())
    }
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    val media = SpanGen.fromDocuments(spark, sfDir).toDF()
      .select(explode(col("spans")).as("sp"))
      .filter(col("sp.kind") === "media")
      .select(col("sp.media_ref").as("media_ref"))
    time("media_refs")(media.count())
    spark.stop()
  }
}
