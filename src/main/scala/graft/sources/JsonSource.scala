package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructType}

/** JSON-lines source with explicit schema and PERMISSIVE corrupt-record
  * capture — the ingestion posture for a crawl firehose at 100 TB:
  * never infer schema (a second full scan and a single bad file can
  * flip a column's type), never fail the job on one mangled line
  * (FAILFAST turns a 10^-9 corruption rate into a dead 12-hour run),
  * never silently drop it either (DROPMALFORMED hides data loss).
  * Malformed lines surface as rows with the raw text in
  * `_corrupt_record` and null data columns, so the pipeline can count,
  * quarantine, and re-crawl them — oracled in `q_json_source`.
  */
object JsonSource {

  val CorruptCol = "_corrupt_record"

  /** Read `path` as JSON lines under `schema`, appending the corrupt-
    * record column. Schema must not already contain it.
    */
  def readPermissive(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not predeclare $CorruptCol")
    spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
  }
}
