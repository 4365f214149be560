package graft.ann

import graft.textops.TextOps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hashing-trick featurization (Weinberger et al. 2009): each token is
  * hashed into a fixed-dimension index and per-document counts are
  * summed per index — the fixed-width sparse bag-of-words features a
  * linear quality classifier or clustering pass trains on, with no
  * global vocabulary to build or broadcast.
  *
  * Scale posture: record-local explode + one map-side-combined shuffle
  * on (doc_id, feat_idx); output cardinality is bounded by
  * docs x dim regardless of vocabulary size. The hash is the portable
  * 60-bit md5 so the DuckDB oracle replays the bucketing exactly.
  */
object FeatureHash {

  /** (doc_id, feat_idx, weight): weight = token occurrences hashing to
    * feat_idx = md5_60(salt || token) % dim. Rows with zero weight are
    * absent (sparse form).
    */
  def features(docs: DataFrame, idCol: String, textCol: String,
      dim: Int, salt: String = "feat"): DataFrame = {
    require(dim > 0, s"dim must be positive: $dim")
    graft.Parallelize.bySplits(
        docs.select(col(idCol).as("doc_id"), col(textCol).as("__t")), "doc_id")
      .select(col("doc_id"), explode(TextOps.tokens(col("__t"))).as("tok"))
      .select(col("doc_id"),
        pmod(graft.PortableHash.salted60(col("tok"), salt), lit(dim.toLong))
          .as("feat_idx"))
      .groupBy(col("doc_id"), col("feat_idx"))
      .agg(count(lit(1)).as("weight"))
  }
}
