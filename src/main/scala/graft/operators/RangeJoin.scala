package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale path for interval-containment joins (point x in [lo, hi]).
  *
  * Spark plans a raw `lo <= x AND x <= hi` join as a broadcast nested
  * loop (fine while one side broadcasts — q_containment_join keeps that
  * baseline) or, with two large sides, a cartesian product — a
  * scale-killer. The standard fix: bin both sides into fixed-width
  * buckets and EQUI-join on the bucket key, then apply the exact range
  * predicate. An interval spans ceil(len/width)+1 buckets, so the
  * explode fan-out is bounded by the documented maximum interval
  * length; the shuffle is keyed by bucket and no cross product ever
  * materializes. Pick `width` near the typical interval length: larger
  * widths cut fan-out but grow per-bucket candidate counts.
  */
object RangeJoin {

  /** Inner join of `points` (value `pointCol`) with `intervals`
    * (`[loCol, hiCol]`, closed) via bucketed equi-join. Returns all
    * columns of both sides; column names must be disjoint.
    *
    * Inverted intervals (lo > hi) are dropped before the explode: a
    * closed interval with lo > hi contains no point, so the exact
    * predicate would discard every candidate anyway — but Spark's
    * `sequence(start, stop)` with start > stop generates a DESCENDING
    * bucket list (implicit step -1), silently fanning each bad row out
    * to unbounded spurious candidates first. The filter keeps the
    * output identical and the cost bounded.
    */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      width: Double): DataFrame = {
    require(width > 0, s"width must be positive, got $width")
    val p = points.withColumn("__bucket",
      floor(col(pointCol) / width).cast("long"))
    val iv = intervals
      .filter(col(loCol) <= col(hiCol))
      .withColumn("__bucket",
        explode(sequence(
          floor(col(loCol) / width).cast("long"),
          floor(col(hiCol) / width).cast("long"))))
    p.join(iv, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }
}
