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
    * with the reference's field names, in offset order. Docs with no
    * decodable box are omitted (the reference dumps nothing for them).
    *
    * Shape: spans already arrive grouped per document row, so this is
    * ONE shuffle-free Project over array HOFs — an explode + groupBy
    * formulation would pay a full hash exchange to rebuild a grouping
    * the input already has. try_cast, not cast: under ANSI mode (Spark 4
    * default) a malformed payload would otherwise kill the task instead
    * of being skipped. The payload is x0,x1,y0,y1 top-down; the
    * reference's YBottom/YTop map to our bottomY/topY (box.go:12-16).
    *
    * Cost notes (to_json is CodegenFallback, so this tree evaluates
    * interpreted — every subexpression repeat is paid per span):
    * split(media_ref) runs ONCE per span (the first transform hoists it
    * into a struct field; the naive form re-split 6x), and the offset
    * sort is sort_array on an offset-first struct — a direct ordering
    * comparison — instead of array_sort's interpreted per-comparison
    * lambda. Offsets are unique within a doc (they are the span-sequence
    * positions), so the struct tie-break fields never fire.
    */
  def boxesJson(spark: SparkSession, spans: DataFrame): DataFrame =
    spans
      .select(col("doc_id"), expr(
        """to_json(
          |  transform(
          |    filter(
          |      transform(
          |        sort_array(transform(spans, s -> named_struct(
          |          'o', s.offset,
          |          'p', split(s.media_ref, ',', -1),
          |          't', s.text,
          |          'k', s.kind))),
          |        s -> named_struct(
          |          'XLeft',   try_cast(try_element_at(s.p, 1) AS DOUBLE),
          |          'XRight',  try_cast(try_element_at(s.p, 2) AS DOUBLE),
          |          'YBottom', try_cast(try_element_at(s.p, 4) AS DOUBLE),
          |          'YTop',    try_cast(try_element_at(s.p, 3) AS DOUBLE),
          |          'Content', s.t,
          |          'ok', s.k = 'word_box' AND size(s.p) = 4)),
          |      b -> b.ok AND b.XLeft IS NOT NULL AND b.XRight IS NOT NULL
          |        AND b.YTop IS NOT NULL AND b.YBottom IS NOT NULL
          |        AND b.XLeft <= b.XRight AND b.YTop <= b.YBottom),
          |    b -> named_struct(
          |      'XLeft', b.XLeft, 'XRight', b.XRight, 'YBottom', b.YBottom,
          |      'YTop', b.YTop, 'Content', b.Content)))""".stripMargin).as("boxes_json"))
      .filter(col("boxes_json") =!= "[]")
}
