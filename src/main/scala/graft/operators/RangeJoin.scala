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

  /** Inner join of two INTERVAL sides on closed-interval overlap
    * (`lLo <= rHi AND rLo <= lHi`) via the same bucketed equi-join —
    * the two-un-broadcastable-sides plan for time-range / span-overlap
    * joins where [[pointInInterval]] doesn't apply because both sides
    * have extent. Column names must be disjoint.
    *
    * An overlapping pair shares every bucket in the intersection of
    * the two bucket ranges, so a naive bucket join emits it once PER
    * SHARED BUCKET. Rather than a `distinct()` (a second shuffle over
    * the whole candidate set), each pair is kept only in the FIRST
    * bucket both intervals cover — `floor(max(lLo, rLo) / width)` —
    * which every overlapping pair covers exactly once: dedup becomes a
    * codegen'd filter on the join output. Inverted intervals are
    * dropped on both sides for the same descending-`sequence` reason
    * as [[pointInInterval]].
    */
  def intervalOverlap(
      left: DataFrame,
      lLo: String,
      lHi: String,
      right: DataFrame,
      rLo: String,
      rHi: String,
      width: Double): DataFrame = {
    require(width > 0, s"width must be positive, got $width")
    def buckets(df: DataFrame, lo: String, hi: String) = df
      .filter(col(lo) <= col(hi))
      .withColumn("__bucket",
        explode(sequence(
          floor(col(lo) / width).cast("long"),
          floor(col(hi) / width).cast("long"))))
    buckets(left, lLo, lHi).join(buckets(right, rLo, rHi), Seq("__bucket"))
      .filter(col(lLo) <= col(rHi) && col(rLo) <= col(lHi))
      .filter(col("__bucket") ===
        floor(greatest(col(lLo), col(rLo)) / width).cast("long"))
      .drop("__bucket")
  }
}
