package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto-front (skyline) selection — "keep every row not
  * dominated by another row", where row B dominates row A when B is
  * >= A on both axes and > A on at least one. The corpus-curation use:
  * pick documents on the quality/length frontier instead of
  * thresholding each axis independently.
  *
  * The naive skyline is an O(n²) self-join — a scale-killer. For two
  * dimensions the front is a monotone staircase, so it reduces to:
  *
  *  1. max(y) per distinct x — ONE map-side-combinable shuffle over
  *     the data;
  *  2. a running max over the per-x table sorted by x descending —
  *     a window over ONE ROW PER DISTINCT X (bounded metadata, not
  *     data; bucket x first if it is continuous);
  *  3. keep the x-groups whose max-y strictly exceeds every max-y at
  *     larger x, then join the surviving (x, y) pairs back —
  *     broadcastable, the front is tiny.
  *
  * Equal points do not dominate each other (domination needs one
  * strict axis), so every row tied with a front point is on the front.
  */
object Skyline {

  def front2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val perX = df.groupBy(col(xCol).as("__x")).agg(max(col(yCol)).as("__maxy"))
    // One row per distinct x: the unpartitioned window is deliberate
    // and bounded (see scaladoc).
    val stairs = perX.withColumn("__prevmax",
        max(col("__maxy")).over(
          Window.orderBy(col("__x").desc)
            .rowsBetween(Window.unboundedPreceding, -1)))
      .filter(col("__prevmax").isNull || col("__prevmax") < col("__maxy"))
      .select(col("__x"), col("__maxy"))
    df.join(broadcast(stairs),
        df(xCol) === col("__x") && df(yCol) === col("__maxy"))
      .drop("__x", "__maxy")
  }
}
