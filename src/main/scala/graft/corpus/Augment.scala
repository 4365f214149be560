package graft.corpus

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.PortableHash

/** Deterministic training-example construction: fill-in-the-middle
  * splits (Bavarian et al. 2022, "Efficient Training of Language
  * Models to Fill in the Middle") and contrastive crop pairs (ICT /
  * Contriever-style two random spans per document).
  *
  * Both are RECORD-LOCAL column transforms — zero shuffles, whole-rows
  * stream through one projection — and both draw their "randomness"
  * from the salted portable 60-bit hash of the doc id, so the same doc
  * always yields the same example (reproducible training sets,
  * resumable jobs, and a DuckDB oracle that replays every offset
  * bit-for-bit).
  *
  * Token grid: the RAW single-space split (`split(text, ' ', -1)`,
  * empties kept) — the only split both engines reproduce positionally
  * without a filter step; rejoining with ' ' is lossless on it.
  */
object Augment {

  private def tokens(text: Column): Column = split(text, " ", -1)

  /** FIM split: two hash-derived cut points in [0, n] (lo = min,
    * hi = max) divide each doc's tokens into (prefix, middle, suffix);
    * any segment may be empty, exactly like sampled FIM cuts. Output:
    * (idCol, prefix, middle, suffix, n_tok).
    */
  def fimSplit(docs: DataFrame, idCol: String, textCol: String,
      salt: String = "fim"): DataFrame = {
    val tk = tokens(col(textCol))
    val n = size(tk)
    def cut(tag: String): Column =
      PortableHash.md5Hash60(
        concat(lit(s"$salt:$tag:"), col(idCol).cast("string"))) % (n + 1)
    val lo = least(cut("a"), cut("b"))
    val hi = greatest(cut("a"), cut("b"))
    docs.select(col(idCol),
      array_join(slice(tk, lit(1), lo), " ").as("prefix"),
      array_join(slice(tk, lo + 1, hi - lo), " ").as("middle"),
      array_join(slice(tk, hi + 1, n - hi), " ").as("suffix"),
      n.cast("long").as("n_tok"))
  }

  /** Contrastive crop pair: two independent hash-derived windows of
    * `cropLen` tokens (the whole doc when shorter). Output:
    * (idCol, crop_a, crop_b, n_tok).
    */
  def contrastiveCrops(docs: DataFrame, idCol: String, textCol: String,
      cropLen: Int, salt: String = "crop"): DataFrame = {
    require(cropLen > 0, s"cropLen must be positive: $cropLen")
    val tk = tokens(col(textCol))
    val n = size(tk)
    val len = least(lit(cropLen), n)
    def crop(tag: String): Column = {
      val off = PortableHash.md5Hash60(
        concat(lit(s"$salt:$tag:"), col(idCol).cast("string"))) % (n - len + 1)
      array_join(slice(tk, off + 1, len), " ")
    }
    docs.select(col(idCol),
      crop("a").as("crop_a"), crop("b").as("crop_b"),
      n.cast("long").as("n_tok"))
  }
}
