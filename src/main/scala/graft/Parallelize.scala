package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Elision-aware input spreading for CPU-heavy record-local stages.
  *
  * A small table arrives as one parquet split, which pins everything
  * upstream of the first exchange — per-row hashing, codecs, HOF
  * pipelines — to a single core. At production scale the scan has
  * plenty of splits (`spark.sql.files.maxPartitionBytes` splits large
  * files for free) and this is a no-op; only under-split inputs pay the
  * one narrow shuffle, which moves the projected input columns only.
  * Same posture as `Extract.distributed`'s shuffle elision.
  */
object Parallelize {

  /** Hash-repartition `df` on `key` iff the current plan yields fewer
    * than `factor` x session-parallelism partitions (the target count).
    * Use `factor > 1` when a downstream consumer oversubscribes
    * partitions (e.g. `Extract.distributed`'s 4x skew posture) so it
    * can elide its own exchange instead of re-shuffling the spread
    * output — the guard tests against the same target it repartitions
    * to, so an input anywhere below the consumer's elision threshold
    * still gets spread.
    */
  def bySplits(df: DataFrame, key: String, factor: Int = 1): DataFrame = {
    val spark = df.sparkSession
    val parallelism = math.max(1, spark.sparkContext.defaultParallelism)
    if (df.queryExecution.toRdd.getNumPartitions < parallelism * factor)
      df.repartition(parallelism * factor, col(key))
    else df
  }
}
