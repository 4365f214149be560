package graft.tools

import org.apache.spark.sql.functions._

/** Temporary: decompose extract_boxes_debug cost (span synthesis, sort,
  * split+cast transform, to_json) in one JVM. */
object BoxesPerf {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Bench.session(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.fixtures.SpanGen.fromDocuments(spark, sfDir).toDF()
    def time(label: String)(f: => Long): Unit = {
      f
      val t0 = System.nanoTime(); val n = f
      println(f"[perf] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    time("spangen_only") { docs.count() }
    time("sorted_struct_only") {
      docs.select(col("doc_id"), expr(
        """size(sort_array(transform(spans, s -> named_struct(
          |  'o', s.offset, 'p', split(s.media_ref, ',', -1), 't', s.text, 'k', s.kind))))""".stripMargin))
        .filter(col("doc_id").isNotNull).count()
    }
    time("unsorted_struct_only") {
      docs.select(col("doc_id"), expr(
        """size(transform(spans, s -> named_struct(
          |  'o', s.offset, 'p', split(s.media_ref, ',', -1), 't', s.text, 'k', s.kind)))""".stripMargin))
        .filter(col("doc_id").isNotNull).count()
    }
    time("full_no_tojson") {
      docs.select(col("doc_id"), expr(
        """size(
          |  transform(
          |    filter(
          |      transform(
          |        sort_array(transform(spans, s -> named_struct(
          |          'o', s.offset, 'p', split(s.media_ref, ',', -1), 't', s.text, 'k', s.kind))),
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
          |      'YTop', b.YTop, 'Content', b.Content)))""".stripMargin))
        .filter(col("doc_id").isNotNull).count()
    }
    time("full_boxes_json") {
      graft.sinks.DebugBoxes.boxesJson(spark, docs).count()
    }
    spark.stop()
  }
}
