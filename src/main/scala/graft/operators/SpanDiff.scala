package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Positional diff between two span-sequence tables — the engine's own
  * correctness invariant (span-sequence equality on (kind, text,
  * media_ref, order)) as a distributed operator, so a pipeline change
  * can be regression-checked against a golden extraction at corpus
  * scale instead of doc-by-doc on the driver.
  *
  * Output: one row per document appearing on either side —
  * (id, first_diff_pos, n_a, n_b, status) where `first_diff_pos` is the
  * smallest position whose payloads differ (a missing position on
  * either side counts as a difference) and `status` is 'equal' iff no
  * position differs — which, because missing positions differ, also
  * implies n_a == n_b.
  *
  * Scale shape (10^9-doc golden diff): the two sides full-outer-join on
  * (id, pos) — per-ROW state, so a pathological multi-million-span
  * document never has to assemble in one executor (the per-doc
  * collect_list alternative would) — then a map-side-combinable
  * min/count aggregation per doc. Two shuffles total, both on keys the
  * data is already well-distributed over; null-safe struct equality
  * (`<=>`) keeps the payload comparison inside whole-stage codegen.
  */
object SpanDiff {

  def diff(a: DataFrame, b: DataFrame, idCol: String, posCol: String,
      payload: Seq[String]): DataFrame = {
    val va = a.select(col(idCol), col(posCol),
      struct(payload.map(col): _*).as("__va"))
    val vb = b.select(col(idCol), col(posCol),
      struct(payload.map(col): _*).as("__vb"))
    va.join(vb, Seq(idCol, posCol), "full_outer")
      .groupBy(col(idCol))
      .agg(
        min(when(!(col("__va") <=> col("__vb")), col(posCol)))
          .as("first_diff_pos"),
        count(col("__va")).as("n_a"),
        count(col("__vb")).as("n_b"))
      .withColumn("status",
        when(col("first_diff_pos").isNull, lit("equal"))
          .otherwise(lit("diverged")))
  }
}
