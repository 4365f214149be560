package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev-loop subset of graft.Verify: dump only the named queries (comma
  * list) plus their oracle entries, so tools/oracle_check.py replays
  * just those rows. Keeps the full-gate cycle out of the inner loop.
  * Usage: runMain graft.tools.VerifyOne <sfDir> <outDir> <q1,q2,...>
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, names) = args
    val wanted = names.split(",").map(_.trim).filter(_.nonEmpty).toSet
    val unknown = wanted -- graft.SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // dump the span-input tables any wanted oracle references, exactly
    // as graft.Verify does (the {OUT}/spans_*_input parquet dirs)
    locally {
      import org.apache.spark.sql.functions.{col, explode}
      def dump(df: org.apache.spark.sql.DataFrame, name: String): Unit =
        df.select(col("doc_id"), explode(col("spans")).as("s"))
          .select(col("doc_id"), col("s.offset").as("offset"),
            col("s.kind").as("kind"), col("s.text").as("text"),
            col("s.media_ref").as("media_ref"))
          .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      val sqls = graft.SparkEntry.oracleSql.filter { case (k, _) => wanted(k) }.values
      if (sqls.exists(_.contains("{OUT}/spans_input")))
        dump(graft.fixtures.SpanGen.fromDocuments(spark, sfDir).toDF(), "spans_input")
      if (sqls.exists(_.contains("{OUT}/spans_adv_input")))
        dump(graft.fixtures.SpanGen.adversarialDocs(spark).toDF(), "spans_adv_input")
    }
    wanted.foreach { name =>
      graft.SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql
      .filter { case (k, _) => wanted(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v.replace("{OUT}", outDir))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
