package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Linear-interpolation join — the numeric sibling of [[AsOf]]: each
  * query timestamp gets the value linearly interpolated between its
  * bracketing series points (metric alignment, sensor resampling,
  * mark-to-market between quotes). As-of answers "latest value at or
  * before t"; interpolation answers "value AT t assuming the series
  * is piecewise linear".
  *
  * Semantics: per key, for query time t with bracketing series points
  * (p_ts, p_val) and (n_ts, n_val): exact hit (p_ts == t) returns
  * p_val; no bracket on either side returns null (strict — no
  * extrapolation); otherwise p_val + (n_val - p_val) * ((t - p_ts) /
  * (n_ts - p_ts)). Timestamps are integer MICROseconds end to end
  * (double epoch seconds carry ~0.5 us ulp at 2024 epochs); the
  * interpolation itself is one fixed IEEE expression over exact
  * integer-difference operands, so any IEEE engine replays it
  * bit-for-bit.
  *
  * Scale posture: the [[AsOf]] tag-union trick twice over — series
  * and query rows union into ONE keyed frame; the previous point is
  * an ignore-nulls last_value over the backward frame, the next an
  * ignore-nulls first_value over the forward frame. One shuffle, one
  * sort, two O(1)-state window passes — never a range cross-product.
  * Equal-timestamp ordering puts series rows first, which is what
  * makes the exact-hit case fall out of the backward pass.
  */
object InterpJoin {

  /** (keyCol, idCol, q_us, interp_value) for every query row. */
  def interpolate(series: DataFrame, queries: DataFrame, keyCol: String,
      tsCol: String, valCol: String, idCol: String): DataFrame = {
    // parquet naive timestamps read as TIMESTAMP_NTZ; under the UTC
    // session the cast preserves the instant (stream-drain precedent)
    val us = unix_micros(col(tsCol).cast("timestamp"))
    val s = series.select(col(keyCol), col(idCol),
      us.as("us"), lit(0).as("kind"),
      us.as("s_us"), col(valCol).cast("double").as("s_val"))
    val q = queries.select(col(keyCol), col(idCol),
      us.as("us"), lit(1).as("kind"),
      lit(null).cast("long").as("s_us"), lit(null).cast("double").as("s_val"))
    val order = Seq(col("us"), col("kind"), col(idCol))
    val wb = Window.partitionBy(col(keyCol)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col(keyCol)).orderBy(order: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    s.unionByName(q)
      .select(col(keyCol), col(idCol), col("us"), col("kind"),
        last(col("s_us"), ignoreNulls = true).over(wb).as("p_us"),
        last(col("s_val"), ignoreNulls = true).over(wb).as("p_val"),
        first(col("s_us"), ignoreNulls = true).over(wf).as("n_us"),
        first(col("s_val"), ignoreNulls = true).over(wf).as("n_val"))
      .filter(col("kind") === 1)
      .select(col(keyCol), col(idCol), col("us").as("q_us"),
        when(col("p_us") === col("us"), col("p_val"))
          .when(col("p_us").isNull || col("n_us").isNull, lit(null).cast("double"))
          .otherwise(col("p_val") + (col("n_val") - col("p_val")) *
            ((col("us") - col("p_us")).cast("double") /
              (col("n_us") - col("p_us")).cast("double")))
          .as("interp_value"))
  }
}
