package graft.lineage

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Storage seam for the output + metrics tables. The sandbox has no
  * Iceberg runtime jar, so the default is Parquet with an Iceberg-shaped
  * layout (append-only, partition column, directory pruning); on a real
  * cluster `IcebergCatalog` is the only class that changes — the engine
  * code is catalog-agnostic (SURVEY.md §7 hard part (d)).
  */
trait TableCatalog {
  def append(df: DataFrame, table: String): Unit
  def appendPartitioned(df: DataFrame, table: String, partitionCol: String): Unit
  def read(spark: SparkSession, table: String): DataFrame
  def exists(spark: SparkSession, table: String): Boolean
}

/** Parquet-backed default: `table` is a filesystem path. */
object ParquetCatalog extends TableCatalog {
  override def append(df: DataFrame, table: String): Unit =
    df.write.mode(SaveMode.Append).parquet(table)
  override def appendPartitioned(df: DataFrame, table: String, partitionCol: String): Unit =
    df.write.mode(SaveMode.Append).partitionBy(partitionCol).parquet(table)
  override def read(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(table)
  override def exists(spark: SparkSession, table: String): Boolean =
    try { spark.read.parquet(table).schema; true }
    catch { case _: org.apache.spark.sql.AnalysisException => false }
}

/** Iceberg mapping (not constructible in this sandbox — no runtime jar):
  * `table` is a catalog identifier; appends become
  * `df.writeTo(table).append()` and reads `spark.table(table)`; the
  * run_id partition column maps to a hidden partition transform. Kept
  * as the documented swap point.
  */
// final class IcebergCatalog extends TableCatalog { ... }
