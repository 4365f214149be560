package graft.lineage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed-table co-location — the pre-paid shuffle. A join between
  * two 100 TB-scale tables shuffles BOTH sides on the key every time
  * it runs; when the same join key recurs across a pipeline's runs
  * (doc_id joins on every enrichment pass), the winning layout is to
  * bucket both tables by that key ONCE at write time: Spark's bucketed
  * scan then exposes the hash-partitioning to the planner and the
  * SortMergeJoin consumes both sides with NO exchange at all — the
  * shuffle was paid once, at ingest, amortized over every later join.
  *
  * The managed-table catalog is the sandbox stand-in for the Iceberg
  * warehouse (same seam as `TableCatalog`): `bucketBy(n, key)` +
  * `sortBy(key)` + `saveAsTable`, parquet format, overwrite-idempotent.
  * `bucketedJoin` adds a merge-join hint so a small test-scale side is
  * not broadcast away — the point is the exchange-free SMJ shape that
  * survives when BOTH sides are 100 TB (PlanSpec gates the absence of
  * ShuffleExchange).
  */
object Bucketed {

  /** Idempotent across JVMs: the in-memory catalog forgets tables on
    * restart but their warehouse locations persist, so CREATE would
    * fail on the orphaned directory — drop both before writing.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      nBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), table)
    def rm(f: java.io.File): Unit = {
      val fs = f.listFiles(); if (fs != null) fs.foreach(rm); f.delete(); ()
    }
    if (loc.exists()) rm(loc)
    df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
  }

  /** Inner equi-join of two same-key, same-bucket-count tables;
    * exchange-free by construction.
    */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).hint("merge")
      .join(spark.table(rightTable).hint("merge"), Seq(key))

  /** End-to-end: bucket-write both sides, join exchange-free. */
  def colocatedJoin(
      spark: SparkSession,
      left: DataFrame,
      right: DataFrame,
      key: String,
      nBuckets: Int,
      tablePrefix: String): DataFrame = {
    writeBucketed(left, s"${tablePrefix}_left", key, nBuckets)
    writeBucketed(right, s"${tablePrefix}_right", key, nBuckets)
    bucketedJoin(spark, s"${tablePrefix}_left", s"${tablePrefix}_right", key)
  }
}
