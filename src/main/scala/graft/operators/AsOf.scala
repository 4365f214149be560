package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right row with the same
  * key and right.time <= left.time (DuckDB/kdb ASOF semantics — a right
  * row at exactly the left row's timestamp matches).
  *
  * Spark lacks the operator; per the custom-operator preference order
  * this is implemented by COMPOSITION, not a custom plan: tag-union the
  * two streams and run one window pass per key over the merged
  * time-ordered stream, carrying the last right payload forward. Right
  * rows sort before left rows at equal timestamps (tag order), and ties
  * among right rows resolve by a caller-named tiebreak column, so the
  * result is deterministic and engine-portable.
  *
  * Scale posture: ONE shuffle on the key + one sort — the same cost
  * class as a regular sort-merge join, with none of the range-join
  * cross-product risk; the window state is a single struct, so memory
  * per partition is O(1) beyond the sort. Payloads are struct-wrapped
  * inside the window so genuinely-null payload VALUES still match
  * (ignoreNulls skips only the left rows' sentinel).
  */
object AsOf {

  /** Left columns + `outCol` = the as-of matched `rightPayload` (null
    * when no right row precedes). `left` must not already contain
    * `outCol`; `key`/`time` column names must match across both sides.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      rightTiebreak: String,
      rightPayload: String,
      outCol: String = "asof_match"): DataFrame = {
    val lcols = left.columns.toSeq
    require(!lcols.contains(outCol), s"left already has column $outCol")
    val tbType = right.schema(rightTiebreak).dataType
    val payStruct = struct(col(rightPayload).as("v"))
    val lSide = left
      .withColumn("__tag", lit(1))
      .withColumn("__tb", lit(null).cast(tbType))
      .withColumn("__pay", lit(null).cast(s"struct<v:${right.schema(rightPayload).dataType.sql}>"))
    val rBase = right.select(
      col(key), col(time), lit(0).as("__tag"),
      col(rightTiebreak).as("__tb"), payStruct.as("__pay"))
    val rSide = lcols.filterNot(c => c == key || c == time)
      .foldLeft(rBase) { (df, c) =>
        df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
      .select(lSide.columns.map(col).toSeq: _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("__tag"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, 0)
    lSide.unionByName(rSide)
      .withColumn("__m", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select((lcols.map(col) :+ col("__m").getField("v").as(outCol)): _*)
  }
}
