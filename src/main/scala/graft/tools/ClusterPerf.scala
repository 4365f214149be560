package graft.tools

import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Temporary perf triage for q_dedup_cluster (not part of the public
  * surface): stage-level timing of the MinHash pair pipeline vs the
  * connected-components round loop at bench scale.
  */
object ClusterPerf {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Bench.session(cpus)
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[perf] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // cluster FIRST — the driver bench hits it cold (alphabetically
    // before q_dedup_minhash), so cold-JVM cost is what it measures
    time("cluster_count_cold") {
      Dedup.nearDupClusters(docs, "doc_id", "text", 3, 64, 16, 0.5).count()
    }
    time("minhash_pairs_count") {
      Dedup.minhashNearDups(docs, "doc_id", "text", 3, 64, 16, 0.5).count()
    }
    time("cluster_count_warm") {
      Dedup.nearDupClusters(docs, "doc_id", "text", 3, 64, 16, 0.5).count()
    }
    spark.stop()
  }
}
