package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed per-key reconciliation via `KeyValueGroupedDataset.cogroup` —
  * the Dataset API's co-partitioned two-stream fold: both sides
  * shuffle ONCE onto the key, then each key's two iterators meet in a
  * single task with no join operator, no row multiplication, and
  * arbitrary per-key Scala logic. The shape for per-entity
  * reconciliation summaries where a join would first build the
  * clicks × purchases product that the aggregation immediately
  * collapses.
  *
  * Determinism: both iterators are sorted in-task by (time, id) before
  * folding, so the emitted summary never depends on shuffle arrival
  * order. Per-key state here is O(1) after the sort; for very hot keys
  * the sort is the bound (same envelope as any keyed window).
  */
object CoGroup {

  /** Per-user click/purchase reconciliation over an event log:
    * (user_id, n_clicks, n_purchases, last_click_us,
    * first_purchase_us) — nulls where a side is absent for the user.
    */
  def clickPurchaseRecon(
      spark: SparkSession,
      clicks: DataFrame,
      purchases: DataFrame): DataFrame = {
    import spark.implicits._
    val c = clicks.select("user_id", "us", "event_id").as[(Long, Long, Long)]
    val p = purchases.select("user_id", "us", "event_id").as[(Long, Long, Long)]
    c.groupByKey(_._1)
      .cogroup(p.groupByKey(_._1)) { (user, cs, ps) =>
        val cv = cs.toVector.sortBy(e => (e._2, e._3))
        val pv = ps.toVector.sortBy(e => (e._2, e._3))
        Iterator((user, cv.size.toLong, pv.size.toLong,
          cv.lastOption.map(_._2), pv.headOption.map(_._2)))
      }
      .toDF("user_id", "n_clicks", "n_purchases",
        "last_click_us", "first_purchase_us")
  }
}
