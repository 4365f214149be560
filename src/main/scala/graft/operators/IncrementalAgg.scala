package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view refresh
  * primitive for continual ingestion: hold per-group mergeable
  * statistics (count, sum, min, max) as a state table and fold each
  * new batch into it WITHOUT rescanning the base. At 100 TB the full
  * regroup is the job you must never run twice; the refresh touches
  * O(state groups + delta rows) only.
  *
  * Only insert-monotone statistics are maintained: count and sum are
  * retraction-capable in principle, but min/max are not subtractable
  * (deleting the current min forces a regroup of that group), so this
  * operator is defined for append-only deltas — the corpus-ingestion
  * case. Deletions route through the MERGE/tombstone machinery
  * (`lineage/MergeUpsert.scala`) followed by a per-group rebuild of
  * the touched groups.
  *
  * Laws (spec-gated): refresh(state(A), B) == state(A union B), so
  * refreshes are associative and order-independent batch over batch;
  * an empty delta is a no-op; groups absent from the state appear.
  *
  * Scale posture: the delta is pre-aggregated (map-side combinable)
  * to one row per touched group, then unioned with the state and
  * re-combined — ONE shuffle of O(groups) rows; the base data is
  * never read. Averages and other ratios derive from (count, sum) at
  * read time rather than being stored (they do not merge).
  */
object IncrementalAgg {

  private def combine(partials: DataFrame, keyCols: Seq[String]): DataFrame =
    partials.groupBy(keyCols.map(col): _*)
      .agg(sum(col("n_rows")).as("n_rows"),
        sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))

  /** Build the per-group state (n_rows, sum_v, min_v, max_v of
    * `valueCol`) from scratch — the bootstrap pass.
    */
  def state(rows: DataFrame, keyCols: Seq[String], valueCol: String): DataFrame =
    combine(
      rows.select(keyCols.map(col) :+ col(valueCol).cast("long").as("v"): _*)
        .select(keyCols.map(col) :+ lit(1L).as("n_rows") :+ col("v").as("sum_v")
          :+ col("v").as("min_v") :+ col("v").as("max_v"): _*),
      keyCols)

  /** Fold an append-only delta batch into an existing state; output
    * rows equal `state(base union delta)` exactly.
    */
  def refresh(prior: DataFrame, delta: DataFrame, keyCols: Seq[String],
      valueCol: String): DataFrame =
    combine(prior.unionByName(state(delta, keyCols, valueCol)), keyCols)
}
