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

  private val InternalCols = Seq("__tag", "__tb", "__pay", "__m")

  /** Left columns + `outCol` = the as-of matched `rightPayload` (null
    * when no right row precedes). `key`/`time` column names must match
    * across both sides. SQL null semantics: right rows with a NULL key
    * or NULL time never match anything (NULL <= t is never true — and
    * under the window formulation a null time would sort FIRST and
    * masquerade as the earliest right); left rows with a NULL time or
    * key get a null match.
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
    for (c <- InternalCols) {
      require(!lcols.contains(c), s"left must not contain reserved column $c")
      require(!right.columns.contains(c), s"right must not contain reserved column $c")
    }
    val tbType = right.schema(rightTiebreak).dataType
    val lSide = left
      .withColumn("__tag", lit(1))
      .withColumn("__tb", lit(null).cast(tbType))
      .withColumn("__pay",
        lit(null).cast(s"struct<v:${right.schema(rightPayload).dataType.sql}>"))
    val rSide = right
      .filter(col(key).isNotNull && col(time).isNotNull)
      .select(
        col(key), col(time), lit(0).as("__tag"),
        col(rightTiebreak).as("__tb"), struct(col(rightPayload).as("v")).as("__pay"))
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("__tag"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // no extra null guard needed for LEFT rows: with null-keyed/timed
    // rights filtered out, a null-time left sorts first in its
    // partition and a null-key left shares its partition only with
    // other lefts — either way every preceding __pay is null
    lSide.unionByName(rSide, allowMissingColumns = true)
      .withColumn("__m", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select((lcols.map(col) :+ col("__m").getField("v").as(outCol)): _*)
  }
}
