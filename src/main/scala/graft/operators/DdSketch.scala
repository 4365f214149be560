package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** DDSketch-style mergeable quantile sketch (Masson, Rim, Lee, "DDSketch:
  * a fast and fully-mergeable quantile sketch with relative-error
  * guarantees", VLDB 2019): positive values land in log-spaced buckets
  * `floor(ln(v) / ln(gamma))`, so any quantile read back from the
  * bucket histogram is within relative error `alpha` of the true value
  * (gamma = (1+alpha)/(1-alpha)).
  *
  * This is the 100 TB quantile path: the EXACT per-group quantile
  * construction (q_quantiles / q_winsorize) shuffles the full value
  * count-table per group; the sketch is a bounded histogram —
  * O(log(max/min)/alpha) buckets regardless of row count — that
  * MERGES by adding counts (map-side combinable, union = sum, the same
  * property that makes it shuffle- and streaming-friendly).
  *
  * Engine-portability discipline: ln is discretized to integer
  * MICRO-NATS the moment it is taken (the shared grid — see
  * PortableHash/Dsir), then shifted positive and floor-divided by the
  * PRECOMPUTED micro-nat bucket width `widthMn(alpha)` (a Scala-side
  * literal, so only ln(v) itself ever crosses engines). All sketch
  * state and quantile output is BIGINT — no float compare anywhere.
  *
  * Zero/negative values have no logarithm: callers filter them (or
  * count them in a side column) — `sketch` drops them and says so in
  * the output contract.
  */
object DdSketch {

  /** Shift making every double's micro-nat ln positive:
    * ln(4.9e-324) ~ -744.44 -> -744 440 000 micro-nats > -10^9.
    */
  val OffsetMn: Long = 1000000000L

  /** Micro-nat bucket width for a relative-error target: the
    * Scala-side literal both engines divide by (StrictMath.log — the
    * same libm-independent ln Spark's codegen uses).
    */
  def widthMn(alpha: Double): Long = {
    require(alpha > 0 && alpha < 1, s"alpha in (0,1): $alpha")
    math.floor(StrictMath.log((1 + alpha) / (1 - alpha)) * 1e6 + 0.5).toLong
  }

  /** The mergeable sketch: (groupCol, bin, cnt) over values > 0 —
    * one map-side-combined shuffle, bucket id
    * `(micro_nat_ln(v) + OffsetMn) div widthMn` (operands positive, so
    * truncating and flooring division agree across engines).
    */
  def sketch(df: DataFrame, groupCol: String, valueCol: String,
      alpha: Double = 0.01): DataFrame = {
    val w = widthMn(alpha)
    df.filter(col(valueCol) > 0)
      .select(col(groupCol),
        expr(s"(cast(floor(ln($valueCol) * 1000000.0 + 0.5) as bigint) " +
          s"+ ${OffsetMn}L) div ${w}L").as("bin"))
      .groupBy(col(groupCol), col("bin"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Union of sketches over the same (groupCol, bin, cnt) schema —
    * counts just add.
    */
  def merge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy(sketches.head.columns(0), "bin")
      .agg(sum(col("cnt")).as("cnt"))

  /** Per-group quantile read-back: for each (label, num, den) the
    * smallest bin whose cumulative count reaches rank ceil(num/den * n)
    * (type-1; integer cross-multiplied, no float rank), plus the bin's
    * micro-nat lower bound `lo_mn = bin * widthMn - OffsetMn` (the
    * true quantile's ln lies in [lo_mn, lo_mn + widthMn) up to the
    * half-ulp discretization). Group bucket cardinality is
    * O(log(max/min)/alpha), so the per-group cumsum window is bounded;
    * the quantile spec table broadcasts.
    */
  def quantiles(sk: DataFrame, groupCol: String,
      qs: Seq[(String, Int, Int)], alpha: Double = 0.01): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (_, n, d) => n > 0 && n <= d },
      s"quantiles must be fractions in (0,1]: $qs")
    val w = widthMn(alpha)
    val spark = sk.sparkSession
    import spark.implicits._
    val spec = broadcast(qs.toDF("q_label", "num", "den"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col("bin"))
    val cum = sk
      .withColumn("cum", sum(col("cnt")).over(win))
      .withColumn("n", sum(col("cnt")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(groupCol)))
    cum.crossJoin(spec)
      .filter(col("cum") * col("den") >= col("n") * col("num"))
      .groupBy(col(groupCol), col("q_label"))
      .agg(min(col("bin")).as("bin"), max(col("n")).as("n"))
      .select(col(groupCol), col("q_label"), col("bin"),
        (col("bin") * lit(w) - lit(OffsetMn)).as("lo_mn"), col("n"))
  }
}
