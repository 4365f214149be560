package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** K7 — raw-boxes JSON debug dump (cmd/cli/main.go:75-81,112-119 writes
  * `<name>_boxes_raw.json` / `<name>_boxes.json`: the decoded word boxes
  * as pretty-printed Go `box.Box` structs, fields XLeft/XRight/YBottom/
  * YTop/Content).
  *
  * Spark-first shape: one row per document with a `boxes_json` column —
  * the whole derivation is Column expressions (from_json-free: the bbox
  * payload is split positionally), so it stays in whole-stage codegen and
  * attaches to any span table as a debugging projection. Per-file dumps
  * are a `.write.json` / foreachPartition away; at 10^12 docs a column
  * beats 10^12 files.
  */
object DebugBoxes {

  /** (doc_id, boxes_json): JSON array of the doc's decodable word boxes
    * with the reference's field names, in offset order. try_cast, not
    * cast: under ANSI mode (Spark 4 default) a malformed payload would
    * otherwise kill the task instead of being skipped.
    */
  def boxesJson(spark: SparkSession, spans: DataFrame): DataFrame =
    spans
      .select(col("doc_id"), explode(col("spans")).as("s"))
      .select(col("doc_id"), col("s.offset").as("o"), col("s.kind").as("kind"),
        col("s.text").as("Content"), split(col("s.media_ref"), ",", -1).as("p"))
      .filter(col("kind") === "word_box" && size(col("p")) === 4)
      // graft's payload is x0,x1,y0,y1 top-down; the reference's
      // YBottom/YTop naming maps to our bottomY/topY (box.go:12-16)
      .withColumn("XLeft", expr("try_cast(p[0] AS DOUBLE)"))
      .withColumn("XRight", expr("try_cast(p[1] AS DOUBLE)"))
      .withColumn("YBottom", expr("try_cast(p[3] AS DOUBLE)"))
      .withColumn("YTop", expr("try_cast(p[2] AS DOUBLE)"))
      .filter(col("XLeft").isNotNull && col("XRight").isNotNull &&
        col("YTop").isNotNull && col("YBottom").isNotNull &&
        col("XLeft") <= col("XRight") && col("YTop") <= col("YBottom"))
      .groupBy(col("doc_id"))
      .agg(to_json(
        transform(
          array_sort(collect_list(struct(col("o"),
            struct(col("XLeft"), col("XRight"), col("YBottom"), col("YTop"),
              col("Content")).as("b")))),
          x => x.getField("b"))).as("boxes_json"))
}
