package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Position-aware header/footer template detection and strip — the
  * site-template killer: a line is boilerplate when it appears in the
  * FIRST (or LAST) `k` lines of at least `minNum/minDen` of one
  * source's documents. Complements [[LineDedup]]: that cuts by GLOBAL
  * line frequency regardless of position; this catches per-site
  * banners/footers that only a minority of the whole corpus shares but
  * nearly every page of one site carries (and, conversely, refuses to
  * cut a popular sentence that shows up mid-document).
  *
  * Threshold is integer cross-multiplied (nd * minDen >= nsrc * minNum)
  * — no float ratio, so the oracle replays it exactly.
  *
  * Scale shape (10^12 docs): line explode → per-doc line count via a
  * window, then the per-doc rebuild groupBy REUSES that window's
  * exchange (same key). Template detection aggregates (source, key)
  * pairs drawn only from edge lines — map-side-combined, key space
  * bounded by distinct edge lines. The template sets are by definition
  * tiny (few distinct strings per site), so the strip join BROADCASTS;
  * no third shuffle. Unlike [[LineDedup]]'s rebuild, blank lines are
  * kept verbatim — a position-aware strip must not also blank-filter.
  */
object Boilerplate {

  /** (idCol, text_clean, n_dropped) with per-source positional
    * templates removed from the first/last `k` lines of every doc.
    */
  def headerFooterStrip(docs: DataFrame, idCol: String, srcCol: String,
      textCol: String, k: Int = 2, minNum: Int = 3, minDen: Int = 10): DataFrame = {
    require(k > 0 && minNum > 0 && minDen > 0, s"bad k=$k $minNum/$minDen")
    val lines = docs.select(col(idCol), col(srcCol),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .withColumn("__key", LineDedup.lineKey(col("line")))
    val wDoc = Window.partitionBy(col(idCol))
    val tagged = lines
      .withColumn("__n", count(lit(1)).over(wDoc))
      .withColumn("__head", col("pos") < k)
      .withColumn("__foot", col("pos") >= col("__n") - k)
    val srcSizes = docs.groupBy(col(srcCol)).agg(count(lit(1)).as("__nsrc"))
    def templates(flag: Column, marker: String): DataFrame =
      tagged.filter(flag && col("__key") =!= "")
        .select(col(srcCol), col("__key"), col(idCol)).distinct()
        .groupBy(col(srcCol), col("__key")).agg(count(lit(1)).as("__nd"))
        .join(broadcast(srcSizes), Seq(srcCol))
        .filter(col("__nd") * minDen >= col("__nsrc") * minNum)
        .select(col(srcCol), col("__key"), lit(true).as(marker))
    val marked = tagged
      .join(broadcast(templates(col("__head"), "__isHdr")), Seq(srcCol, "__key"), "left")
      .join(broadcast(templates(col("__foot"), "__isFtr")), Seq(srcCol, "__key"), "left")
      .withColumn("__drop",
        (col("__head") && coalesce(col("__isHdr"), lit(false))) ||
        (col("__foot") && coalesce(col("__isFtr"), lit(false))))
    marked
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(when(!col("__drop"),
              struct(col("pos"), col("line"))))),
            e => e("line")),
          "\n").as("text_clean"),
        count(when(col("__drop"), 1)).as("n_dropped"))
  }

  /** The detected (source, template-key, position-class) table itself —
    * auditability: what WILL be cut, before cutting it.
    */
  def templateAudit(docs: DataFrame, idCol: String, srcCol: String,
      textCol: String, k: Int = 2, minNum: Int = 3, minDen: Int = 10): DataFrame = {
    val lines = docs.select(col(idCol), col(srcCol),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .withColumn("__key", LineDedup.lineKey(col("line")))
    val wDoc = Window.partitionBy(col(idCol))
    val tagged = lines
      .withColumn("__n", count(lit(1)).over(wDoc))
    val srcSizes = docs.groupBy(col(srcCol)).agg(count(lit(1)).as("__nsrc"))
    def side(flag: Column, name: String): DataFrame =
      tagged.filter(flag && col("__key") =!= "")
        .select(col(srcCol), col("__key"), col(idCol)).distinct()
        .groupBy(col(srcCol), col("__key")).agg(count(lit(1)).as("n_docs"))
        .join(broadcast(srcSizes), Seq(srcCol))
        .filter(col("n_docs") * minDen >= col("__nsrc") * minNum)
        .select(col(srcCol), col("__key").as("template"),
          lit(name).as("side"), col("n_docs"))
    side(col("pos") < k, "header")
      .unionByName(side(col("pos") >= col("__n") - k, "footer"))
  }
}
