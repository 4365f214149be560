package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** True when the dump must write the span-input fixture parquet: the
    * run is unfiltered, or some SELECTED oracle references the {OUT}
    * placeholder — a filtered run on an extract_* query must never emit
    * oracle SQL pointing at parquet that was not written.
    */
  private[graft] def needsFixtureDump(only: Option[Set[String]]): Boolean =
    only.isEmpty || SparkEntry.oracleSql.exists { case (k, sql) =>
      only.forall(_.contains(k)) && sql.contains("{OUT}")
    }

  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query-name filter for fast local
    // iteration (the driver always passes exactly two args = full dump)
    val Array(sfDir, outDir) = args.take(2)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Dump the synthesized extraction INPUT (the interleaved span table
    // the extract_* queries run on, derived deterministically from
    // documents.parquet) so the extraction oracles can reconstruct the
    // expected output in pure SQL from the same rows. oracleSql entries
    // reference it via the {OUT} placeholder substituted below. With a
    // query filter, dump whenever any SELECTED oracle references {OUT}
    // — a filtered run on an extract_* query must not emit oracle SQL
    // pointing at parquet that was never written.
    val selectedOracles = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
    if (needsFixtureDump(only)) locally {
      import org.apache.spark.sql.functions.{col, explode}
      def dump(df: org.apache.spark.sql.DataFrame, name: String): Unit =
        df.select(col("doc_id"), explode(col("spans")).as("s"))
          .select(col("doc_id"), col("s.offset").as("offset"),
            col("s.kind").as("kind"), col("s.text").as("text"),
            col("s.media_ref").as("media_ref"))
          .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      dump(graft.fixtures.SpanGen.fromDocuments(spark, sfDir).toDF(), "spans_input")
      // the adversarial corpus (strategy-divergent layouts) for the
      // extract_*_adv per-strategy oracles
      dump(graft.fixtures.SpanGen.adversarialDocs(spark).toDF(), "spans_adv_input")
    }
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = selectedOracles
      .map { case (k, v) => s"${q(k)}: ${q(v.replace("{OUT}", outDir))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
