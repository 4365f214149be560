package graft.tools

import java.nio.file.{Files, Paths}

/** Round-6 plan evidence for the MinHash signature stage, which is
  * invisible in the composed queries' dumps (it runs inside their
  * localCheckpoint): writes the formatted plan of the current native
  * minhashSignatures and of the pre-round-6 aggregate formulation to
  * plans/r06/minhash_sigs_{after,before}.txt.
  */
object SigPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get("/root/repo/plans/r06"))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def dump(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val p = Paths.get(s"/root/repo/plans/r06/$name.txt")
      Files.writeString(p, txt)
      println(s"wrote $p")
    }
    dump(graft.dedup.Dedup.minhashSignaturesAgg(docs, "doc_id", "text", 3, 64),
      "minhash_sigs_before")
    dump(graft.dedup.Dedup.minhashSignatures(docs, "doc_id", "text", 3, 64),
      "minhash_sigs_after")
    spark.stop()
  }
}
