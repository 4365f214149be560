package graft.corpus

import graft.textops.TextOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Context-window sequence packing: assign documents to fixed
  * token-budget packs for training-batch assembly.
  *
  * Optimal bin packing is NP-hard and greedy first-fit is inherently
  * serial, so the distributed construction is the standard streaming
  * approximation: documents are dealt by a portable hash into `groups`
  * independent streams, each stream is ordered deterministically by
  * (hash, id) and token counts are cumulated with a window; a document
  * joins pack floor(start_offset / budget) of its stream, where
  * start_offset is the cumulative token count before it. Packs fill to
  * the budget and may overflow by at most one document's tokens (the
  * straddling document belongs to the pack where it starts) — the usual
  * greedy-packing contract; truncation/splitting is the trainer's
  * policy, not the layout's.
  *
  * Scale posture: one shuffle on the group key; each window partition
  * is |corpus| / groups — pick groups >= cluster parallelism so no
  * executor sorts more than its share. Determinism: the (hash, id)
  * order is engine-portable (same md5 construction as Sampling), so a
  * DuckDB oracle replays the exact pack assignment and the layout is
  * identical at any parallelism.
  */
object Packing {

  /** (doc_id, grp, pack_id, n_tokens, start_off): pack layout for the
    * corpus at `budget` tokens per pack across `groups` parallel
    * streams.
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
      budget: Int, groups: Int, salt: String = "pack"): DataFrame =
    packSequences(docs, idCol, TextOps.tokenCount(col(textCol)),
      budget, groups, salt)

  /** As above with an explicit token-count Column — the seam that lets
    * the pack budget run on REAL trained-BPE counts
    * (GraftFunctions.bpeCount) instead of the whitespace proxy.
    */
  def packSequences(docs: DataFrame, idCol: String, tokenCount: Column,
      budget: Int, groups: Int, salt: String): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(groups > 0, s"groups must be positive, got $groups")
    val hv: Column = Sampling.portableHash(col(idCol), salt)
    val base = docs.select(
      col(idCol).cast("long").as("doc_id"),
      tokenCount.as("n_tokens"),
      (hv % groups).cast("int").as("grp"),
      hv.as("__hv"))
    val w = Window.partitionBy(col("grp")).orderBy(col("__hv"), col("doc_id"))
    base
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .withColumn("start_off", (col("__cum") - col("n_tokens")).cast("long"))
      .withColumn("pack_id", floor(col("start_off") / budget).cast("long"))
      .select(col("doc_id"), col("grp"), col("pack_id"), col("n_tokens"),
        col("start_off"))
  }

  /** Packing-efficiency audit over a [[packSequences]] layout — the
    * no-silent-caps companion: greedy streaming packing trades fill
    * quality for determinism and one bounded shuffle, and this makes
    * that trade measurable per pack instead of an article of faith.
    * One groupBy (map-side combinable, one row per pack) over the
    * layout:
    *
    *  - `n_docs`, `n_tokens_sum`: occupancy of the pack (tokens of
    *    every document that STARTS in it — the pack-membership rule);
    *  - `overflow_tokens`: tokens the pack's last document runs past
    *    the budget boundary (the straddle the greedy contract allows;
    *    the trainer truncates or carries these);
    *  - `n_oversize_docs`: documents longer than the whole budget — no
    *    packing can fit them, so they must be split upstream; leaving
    *    them uncounted is exactly the silent cap this audit exists to
    *    prevent.
    *
    * All-integer output (exact across engines); underfill is derivable
    * as budget + overflow_tokens - n_tokens_sum.
    */
  def packAudit(packs: DataFrame, budget: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    packs
      .groupBy(col("grp"), col("pack_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("n_tokens_sum"),
        max(col("start_off") + col("n_tokens")).as("__max_end"),
        sum(when(col("n_tokens") > budget, 1L).otherwise(0L))
          .as("n_oversize_docs"))
      .select(col("grp"), col("pack_id"), col("n_docs"), col("n_tokens_sum"),
        greatest(lit(0L),
          col("__max_end") - (col("pack_id") + 1) * budget).as("overflow_tokens"),
        col("n_oversize_docs"))
  }
}
