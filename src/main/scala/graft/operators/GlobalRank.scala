package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed stable global ranking — `row_number() OVER (ORDER BY
  * ...)` without the scale-killer. Spark plans an un-partitioned
  * ranking window as a SINGLE-partition sort: every row of a 100 TB
  * table funnels through one task. The classic fix is two-pass
  * band-offset ranking:
  *
  *  1. band each row by a fixed-width range of the sort value
  *     (deterministic — no sampled range boundaries, so reruns and
  *     different parallelism give identical output);
  *  2. count rows per band, prefix-sum the counts into band offsets —
  *     a window over ONE ROW PER BAND, thousands of rows, not the
  *     data;
  *  3. rank within each band in parallel (window partitioned by
  *     band), add the band's offset.
  *
  * global_rank is then exactly row_number over (value, tiebreak).
  * Pick `bandWidth` so bands are populated but each band's rows fit a
  * task (value_range / bandWidth bands); skewed bands degrade to the
  * per-band sort, never to a global one.
  */
object GlobalRank {

  /** (all input columns, global_rank) where global_rank = 1-based
    * dense row number under ORDER BY (valueCol, tieCol). `valueCol`
    * must be numeric and non-null; `tieCol` must be unique per row
    * (stability).
    */
  def rankBy(
      df: DataFrame,
      valueCol: String,
      tieCol: String,
      bandWidth: Double): DataFrame = {
    require(bandWidth > 0, s"bandWidth must be positive, got $bandWidth")
    val banded = df.withColumn("__band",
      floor(col(valueCol) / bandWidth).cast("long"))
    val offsets = banded.groupBy("__band").agg(count(lit(1)).as("__bcnt"))
      .withColumn("__offset",
        coalesce(
          sum(col("__bcnt")).over(
            Window.orderBy("__band")
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("__band", "__offset")
    banded.join(broadcast(offsets), Seq("__band"))
      .withColumn("global_rank",
        col("__offset") + row_number().over(
          Window.partitionBy("__band").orderBy(col(valueCol), col(tieCol))))
      .drop("__band", "__offset")
  }
}
