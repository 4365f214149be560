package graft.corpus

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interleaving profile of a (doc, position, kind) span table — the
  * shape statistics a curation pass needs over an interleaved
  * text+media corpus before deciding packing / filtering policy: how
  * many spans of each kind a document carries, how often the modality
  * switches mid-document, and what it opens/closes with (models care:
  * a doc ending in a dangling media ref packs differently than one
  * ending in text).
  *
  * Scale shape: one window sort per doc (the lag that detects kind
  * switches) followed by a groupBy on the same key, so the exchange is
  * reused — one shuffle total, and the aggregation is
  * map-side-combinable. Per-doc state is O(1); a pathological
  * million-span doc never assembles in memory.
  */
object Interleave {

  def profile(spans: DataFrame, idCol: String, posCol: String,
      kindCol: String): DataFrame = {
    val w = Window.partitionBy(idCol).orderBy(posCol)
    spans
      .select(col(idCol), col(posCol), col(kindCol).as("__kind"))
      .withColumn("__prev", lag(col("__kind"), 1).over(w))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_spans"),
        count(when(col("__kind") === "text", 1)).as("n_text"),
        count(when(col("__kind") === "word_box", 1)).as("n_word_box"),
        count(when(col("__kind") === "media", 1)).as("n_media"),
        count(when(col("__prev").isNotNull && col("__prev") =!= col("__kind"), 1))
          .as("n_switches"),
        min_by(col("__kind"), col(posCol)).as("first_kind"),
        max_by(col("__kind"), col(posCol)).as("last_kind"))
  }
}
