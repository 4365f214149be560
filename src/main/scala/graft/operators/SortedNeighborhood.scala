package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sorted-neighborhood blocking (Hernández & Stolfo 1995) — the
  * entity-resolution candidate generator that complements the engine's
  * set-similarity blockers (minhash bands, winnow fingerprints, q-gram
  * prefixes): sort records by a blocking value, slide a window of size
  * `w`, and emit every pair falling within the same window. Records
  * that are near-identical under the sort value become candidates even
  * when they share no exact token — the classic pre-filter before an
  * expensive pairwise matcher (edit distance, embedding cosine).
  *
  * Semantics: global order = (value, id) — the id tiebreak makes the
  * permutation total, so the pair set is deterministic. A pair (a, b)
  * with rank(a) < rank(b) is emitted iff rank(b) - rank(a) < w,
  * exactly once, as (id_a, id_b, rank distance) oriented by rank.
  *
  * Scale posture: the rank comes from [[GlobalRank]]'s band-offset
  * construction (no single-partition sort); the windowed self-pairing
  * is an equi-join on rank buckets of width `w` — the left side keyed
  * by its own bucket, the right side exploded to (bucket, bucket-1),
  * so each qualifying pair shares exactly ONE join key (same-bucket
  * pairs via the right row's own bucket, adjacent-bucket pairs via its
  * shifted one). Fan-out per row is exactly 2 and per-bucket
  * population is <= w + skew-band residue — never an all-pairs join;
  * candidate count is bounded by n * (w-1) by construction, the
  * defining property that makes SNM usable at 10^12 rows.
  */
object SortedNeighborhood {

  /** (id_a, id_b, dist) candidate pairs: 1 <= dist = rank(b) - rank(a)
    * < w under the (valueCol, idCol) total order.
    */
  def candidatePairs(
      df: DataFrame,
      idCol: String,
      valueCol: String,
      w: Int,
      bandWidth: Double): DataFrame = {
    require(w >= 2, s"window must cover at least two rows, got $w")
    val ranked = GlobalRank.rankBy(
        df.select(col(idCol), col(valueCol)), valueCol, idCol, bandWidth)
      .select(col(idCol).as("__id"), col("global_rank").as("__r"))
      .withColumn("__bkt", floor((col("__r") - 1) / w).cast("long"))
    val left = ranked.select(
      col("__id").as("id_a"), col("__r").as("__ra"), col("__bkt").as("__k"))
    val right = ranked.select(
      col("__id").as("id_b"), col("__r").as("__rb"),
      explode(array(col("__bkt"), col("__bkt") - 1)).as("__k"))
      .filter(col("__k") >= 0)
    left.join(right, Seq("__k"))
      .filter((col("__rb") - col("__ra")).between(1, w - 1))
      .select(col("id_a"), col("id_b"), (col("__rb") - col("__ra")).as("dist"))
  }
}
