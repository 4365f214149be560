package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch profiler for EditJoin.similarPairs internals (not graded). */
object EjProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val cpu = new graft.Bench.CpuListener
    spark.sparkContext.addSparkListener(cpu)
    def time(label: String)(f: => Long): Unit = {
      val c0 = cpu.settledCpuNs(); val t0 = System.nanoTime()
      val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      val c = (cpu.settledCpuNs() - c0) / 1e9
      println(f"[ej] $label%-24s $sec%7.2f s  cpu=$c%7.2f s  rows=$n")
    }
    val maxDist = 1; val q = 2
    val cutoff = (maxDist + 1) * q
    val prefixLen = maxDist * q + 1
    val df = spark.read.parquet(sfDir + "/documents.parquet")
      .select(col("doc_id"), substring(col("text"), 1, 16).as("head"))
    val base = graft.Parallelize.bySplits(
      df.select(col("doc_id").cast("long").as("id"), col("head").as("s")), "id")
      .withColumn("len", length(col("s")))
    val eligible = base.filter(col("len") >= cutoff)
    val grams = eligible.select(col("id"),
      posexplode(expr(s"transform(sequence(1, length(s) - ${q - 1}), i -> substring(s, i, $q))"))
        .as(Seq("pos", "gram")))
    time("grams")(grams.count())
    val (keys, _) = graft.dedup.Dedup.checkpointOwned(
      grams.withColumn("occ",
        row_number().over(Window.partitionBy("id", "gram").orderBy("pos")))
        .select("id", "gram", "occ"))
    time("keys_cp")(keys.count())
    val freq = keys.groupBy("gram", "occ").agg(count(lit(1)).as("kfreq"))
    time("freq")(freq.count())
    val ranked = keys.join(freq, Seq("gram", "occ"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("id").orderBy(col("kfreq"), col("gram"), col("occ"))))
      .filter(col("rk") <= prefixLen)
      .select("id", "gram", "occ")
    time("ranked")(ranked.count())
    val verifyParts = spark.sparkContext.defaultParallelism
    val rawPairs = ranked.as("a")
      .join(ranked.as("b"),
        col("a.gram") === col("b.gram") && col("a.occ") === col("b.occ") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    time("raw_pairs")(rawPairs.count())
    val candidates = rawPairs.distinct()
      .repartition(verifyParts, col("id_a"), col("id_b"))
    time("candidates")(candidates.count())
    val gramPairs = candidates
      .join(eligible.select(col("id").as("id_a"), col("s").as("s_a"),
        col("len").as("len_a")), Seq("id_a"))
      .join(eligible.select(col("id").as("id_b"), col("s").as("s_b"),
        col("len").as("len_b")), Seq("id_b"))
      .filter(abs(col("len_a") - col("len_b")) <= maxDist)
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")))
      .filter(col("dist") <= maxDist)
    time("verify")(gramPairs.count())
    // key-frequency profile of the prefix keys actually joined
    println("[ej] top prefix-key group sizes:")
    ranked.groupBy("gram", "occ").agg(count(lit(1)).as("n"))
      .orderBy(desc("n")).limit(12).collect()
      .foreach(r => println(s"[ej]   gram=${r.get(0)} occ=${r.get(1)} n=${r.get(2)}"))
    spark.stop()
  }
}
