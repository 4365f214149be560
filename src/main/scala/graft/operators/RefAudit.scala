package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Referential-integrity audit between a reference column and an
  * inventory — the interleaved-corpus health check: a span that points
  * at media which was never fetched (orphan ref) renders the document
  * unusable for multimodal training, and media nobody references
  * (unused) is storage to reclaim. At crawl scale both are endemic, so
  * the audit is a first-class pipeline stage, not a debug script.
  *
  * Scale shape: both sides reduce to DISTINCT keys before the single
  * full-outer equi-join — payload bytes never move, and the join input
  * is bounded by distinct keys, not row counts. Output is one row per
  * distinct key with its status; callers aggregate per status or join
  * orphans back to their documents.
  */
object RefAudit {

  /** (key, status) for every distinct key on either side; status in
    * 'matched' (both), 'orphan_ref' (referenced, not in inventory),
    * 'unused' (inventoried, never referenced).
    */
  def audit(refs: DataFrame, inventory: DataFrame, keyCol: String): DataFrame = {
    val r = refs.select(col(keyCol)).distinct().withColumn("__r", lit(1))
    val i = inventory.select(col(keyCol)).distinct().withColumn("__i", lit(1))
    r.join(i, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        when(col("__r").isNotNull && col("__i").isNotNull, "matched")
          .when(col("__i").isNull, "orphan_ref")
          .otherwise("unused").as("status"))
  }
}
