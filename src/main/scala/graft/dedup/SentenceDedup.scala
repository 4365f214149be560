package graft.dedup

import graft.PortableHash
import graft.textops.TextOps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-document SENTENCE-level boilerplate removal — the
  * sentence-granular sibling of [[LineDedup]] (CCNet strips frequent
  * lines; cookie banners, legal footers and share-this prompts often
  * survive as mid-line sentences after HTML flattening, which is what
  * this catches). Composes [[TextOps.sentences]] (RE2-portable
  * segmenter) with the LineDedup machinery shape: explode with
  * position, 60-bit portable hash of the normalized sentence, distinct-
  * doc frequency in ONE map-side-combined shuffle, broadcast anti-join
  * strip, order-stable rebuild joined by a single space (the segmenter
  * consumed exactly one space per boundary, so rebuild is lossless for
  * surviving sentences).
  *
  * Scale posture identical to LineDedup: the frequency table is
  * O(distinct sentences) and only (hash, id) pairs shuffle; the strip
  * side broadcasts only the over-threshold hash set, which at any
  * maxDocs worth stripping is tiny relative to the corpus.
  */
object SentenceDedup {

  /** Exploded (id, pos, sent, sent_hash) view, one row per non-empty
    * normalized sentence; pos is the 0-based sentence ordinal.
    */
  def explodeSentences(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
        posexplode(TextOps.sentences(col(textCol))).as(Seq("pos", "sent")))
      .filter(lower(trim(col("sent"))) =!= "")
      .withColumn("sent_hash", PortableHash.md5Hash60(lower(trim(col("sent")))))

  /** Per-distinct-sentence document frequency (in-doc repeats count
    * once): (sent_hash, n_docs).
    */
  def sentenceStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    explodeSentences(df, idCol, textCol)
      .select(col("sent_hash"), col(idCol))
      .distinct()
      .groupBy("sent_hash")
      .agg(count(lit(1)).as("n_docs"))

  /** Strip every sentence appearing in more than `maxDocs` distinct
    * documents; rebuild each doc from its surviving sentences in
    * original order, joined by one space. Returns
    * (id, text_clean, n_kept); all-boilerplate docs survive with empty
    * text, the LineDedup convention.
    */
  def stripFrequentSentences(df: DataFrame, idCol: String, textCol: String,
      maxDocs: Long): DataFrame = {
    val frequent = sentenceStats(df, idCol, textCol)
      .filter(col("n_docs") > maxDocs)
      .select(col("sent_hash"))
    val kept = explodeSentences(df, idCol, textCol)
      .join(broadcast(frequent), Seq("sent_hash"), "left_anti")
    val rebuilt = kept
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("sent")))),
            e => e("sent")),
          " ").as("text_clean"),
        count(lit(1)).as("n_kept"))
    df.select(col(idCol))
      .join(rebuilt, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("text_clean"), lit("")).as("text_clean"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }
}
