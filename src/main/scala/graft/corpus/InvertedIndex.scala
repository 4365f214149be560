package graft.corpus

import graft.textops.TextOps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed inverted index construction: term -> per-document
  * posting with term frequency and ordered 1-based token positions —
  * the retrieval-side artifact a decontamination / attribution pass
  * queries against the training corpus.
  *
  * Scale posture: one posexplode (record-local), one
  * map-side-combined shuffle on (term, doc_id) for the postings, and
  * one term-keyed count shuffle for the document-frequency band
  * filter. Positions are aggregated per (term, doc) — bounded by one
  * document's length, never a whole term's corpus-wide postings — and
  * serialized as a CSV string so the artifact is engine-portable
  * (array columns canonicalize differently across engines; strings
  * hash identically). Stopword-grade terms are excluded by the df
  * band, which also keeps any single term's output fan-in bounded.
  */
object InvertedIndex {

  /** (term, doc_id, tf, positions) for terms whose document frequency
    * lies in [minDf, maxDf]; positions is the comma-joined ascending
    * 1-based token position list.
    */
  def build(docs: DataFrame, idCol: String, textCol: String,
      minDf: Long, maxDf: Long): DataFrame = {
    require(minDf >= 1 && maxDf >= minDf, s"bad df band [$minDf, $maxDf]")
    val postings = graft.Parallelize.bySplits(
        docs.select(col(idCol).as("doc_id"), col(textCol).as("__t")), "doc_id")
      .select(col("doc_id"),
        posexplode(TextOps.tokens(col("__t"))).as(Seq("pos0", "term")))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"),
        array_join(
          transform(sort_array(collect_list(col("pos0") + 1)), p => p.cast("string")),
          ",").as("positions"))
    val dfBand = postings
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf && col("df") <= maxDf)
      .select(col("term"))
    postings.join(dfBand, Seq("term"))
      .select(col("term"), col("doc_id"), col("tf"), col("positions"))
  }
}
