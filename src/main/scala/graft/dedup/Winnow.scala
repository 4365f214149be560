package graft.dedup

import graft.PortableHash
import graft.textops.TextOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Winnowing fingerprints (Schleimer, Wilkerson, Aiken, "Winnowing:
  * Local Algorithms for Document Fingerprinting", SIGMOD 2003 — the
  * MOSS scheme): per document, hash every k-token shingle, slide a
  * window of w consecutive hashes, and select each window's minimum
  * (rightmost occurrence on ties). The selected set is a deterministic,
  * position-aware fingerprint with the paper's guarantee: any two
  * documents sharing a run of at least w + k - 1 tokens share at least
  * one fingerprint — unlike MinHash (whole-doc similarity) this detects
  * LOCAL overlap, and unlike the exact-substring pass it emits a
  * bounded ~1/w density sample instead of every window.
  *
  * Scale posture: entirely record-local HOF columns over the scan
  * (shingle -> portable md5 hash -> window min via slice/array_min) —
  * zero shuffles to fingerprint a corpus; the one distinct at the end
  * is per-(doc, pos, fp). Matching = an equi-join on fp, the same
  * bucketed shape as every other candidate generator here. The portable
  * hash makes the DuckDB oracle replay selections bit-for-bit.
  */
object Winnow {

  /** (doc_id, pos, fp): selected fingerprints, pos = 0-based token
    * offset of the chosen k-gram. Docs with fewer than k tokens emit
    * nothing; docs with fewer than w shingle hashes yield one window
    * (the whole hash sequence).
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 4, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, s"k and w must be positive: k=$k w=$w")
    val hashes: Column =
      transform(TextOps.shingleArray(TextOps.tokens(col("__t")), k),
        s => PortableHash.md5Hash60(s))
    // window j covers hashes [j, j+w); slice clamps the final windows,
    // and greatest(m-w, 0) keeps one whole-sequence window when m < w
    def winSlice(h: Column, j: Column): Column = slice(h, j + 1, lit(w))
    val windows = transform(
      sequence(lit(0), greatest(size(hashes) - w, lit(0))),
      j => {
        val win = winSlice(hashes, j)
        val mn = array_min(win)
        // rightmost occurrence of the min: position from the end via
        // the reversed slice (array_position is 1-based, first match)
        val pos = j + (size(win) - array_position(reverse(win), mn))
        struct(pos.cast("int").as("pos"), mn.as("fp"))
      })
    // a doc with no shingles (fewer than k tokens) must emit nothing,
    // not one garbage window over the empty hash array
    val sel = when(size(hashes) > 0, windows)
      .otherwise(array().cast("array<struct<pos:int,fp:bigint>>"))
    graft.Parallelize.bySplits(
        docs.select(col(idCol).as("doc_id"), col(textCol).as("__t")), "doc_id")
      .select(col("doc_id"), explode(sel).as("s"))
      .select(col("doc_id"), col("s.pos").as("pos"), col("s.fp").as("fp"))
      .distinct()
  }
}
