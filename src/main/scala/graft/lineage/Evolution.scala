package graft.lineage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-evolution surfaces a long-lived 100 TB lakehouse table needs:
  *
  *  - '''Schema evolution''': epochs written years apart carry
  *    different columns; `mergeSchema` reconciles the footers at read
  *    time and old rows surface NULL for columns they predate — no
  *    rewrite of petabytes to add a field.
  *
  *  - '''Dynamic partition overwrite''': an incremental recompute
  *    replaces ONLY the partitions it produced rows for
  *    (`partitionOverwriteMode=dynamic`), leaving every other
  *    partition's files untouched — the daily-refresh pattern; static
  *    overwrite mode would truncate the whole table.
  */
object Evolution {

  /** Two epochs under `root` — epoch1 (even doc_ids) lacks `lang`,
    * epoch2 (odd) carries it — read back as one merged-schema frame
    * where epoch1 rows have NULL lang.
    */
  def mergeSchemaRead(spark: SparkSession, docs: DataFrame, root: String): DataFrame = {
    docs.filter(pmod(col("doc_id"), lit(2)) === 0)
      .select(col("doc_id"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$root/epoch1")
    docs.filter(pmod(col("doc_id"), lit(2)) === 1)
      .select(col("doc_id"), col("n_chars"), col("lang"))
      .write.mode("overwrite").parquet(s"$root/epoch2")
    spark.read.option("mergeSchema", "true")
      .parquet(s"$root/epoch1", s"$root/epoch2")
      .select(col("doc_id"), col("n_chars"), col("lang"))
  }

  /** Full stale write partitioned by source, then a dynamic-mode
    * overwrite recomputing ONLY src1: the read-back shows src1
    * refreshed and every other partition still stale — proof the
    * overwrite touched one partition.
    */
  def dynamicPartitionRefresh(spark: SparkSession, docs: DataFrame,
      root: String): DataFrame = {
    docs.select(col("doc_id"), (col("n_chars") + 1000L).as("n_chars_m"),
        col("source"))
      .write.mode("overwrite").partitionBy("source").parquet(s"$root/tbl")
    docs.filter(col("source") === "src1")
      .select(col("doc_id"), col("n_chars").cast("long").as("n_chars_m"),
        col("source"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("source").parquet(s"$root/tbl")
    spark.read.parquet(s"$root/tbl")
      .select(col("doc_id"), col("n_chars_m"), col("source"))
  }
}
