package graft.corpus

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact and sketched order statistics per group — the "what does the
  * length distribution look like" report that sizes context windows,
  * packing budgets, and outlier gates.
  *
  * Scale posture: the exact path never sorts raw rows. It aggregates to
  * (group, value) counts first — one map-side-combined shuffle — and
  * runs the cumulative window over DISTINCT values only, so the window
  * partition is bounded by the value domain (e.g. document lengths),
  * not the row count. A row_number over raw rows would pull one
  * group's full 10^10 rows through a single window task; this form
  * survives that group.
  *
  * The sketch path is the same computation over a deterministic
  * portable-hash sample (rate keyHash%den < num) — mergeable (the
  * sample of a union is the union of samples) and engine-reproducible,
  * so the DuckDB oracle replays the estimate bit-for-bit rather than
  * asserting a tolerance.
  */
object Quantiles {

  /** Discrete (type-1) quantiles: for each q, the smallest value whose
    * cumulative count reaches ceil(q*n). Output (group, q, q_value),
    * integer-exact for integer value columns.
    */
  def discreteQuantiles(df: DataFrame, groupCol: String, valCol: String,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must lie in (0,1]: $qs")
    val counts = df
      .groupBy(col(groupCol).as("grp"), col(valCol).as("v"))
      .agg(count(lit(1)).as("c"))
    val ordered = Window.partitionBy(col("grp")).orderBy(col("v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(col("grp"))
    counts
      .withColumn("cum", sum(col("c")).over(ordered))
      .withColumn("n", sum(col("c")).over(whole))
      .select(col("grp"), col("v"), col("cum"), col("n"),
        explode(array(qs.map(lit(_)): _*)).as("q"))
      .filter(col("cum") >= ceil(col("q") * col("n")))
      .groupBy(col("grp"), col("q"))
      .agg(min(col("v")).as("q_value"))
      .select(col("grp").as(groupCol), col("q"), col("q_value"))
  }

  /** Sampled quantile estimate: deterministic hash-sample on a key
    * column (portable 60-bit md5, salted), then the exact discrete
    * quantile of the sample. num/den is the sampling rate.
    */
  def sampledQuantiles(df: DataFrame, groupCol: String, valCol: String,
      keyCol: String, qs: Seq[Double], salt: String,
      num: Long, den: Long): DataFrame = {
    require(num > 0 && num <= den, s"rate must satisfy 0 < num <= den: $num/$den")
    discreteQuantiles(
      df.filter(pmod(graft.PortableHash.salted60(col(keyCol), salt), lit(den)) < num),
      groupCol, valCol, qs)
  }

  /** Robust outlier gate: rows whose |value - group median| exceeds
    * k x the group's MAD (median absolute deviation) — the
    * length-outlier filter that survives the heavy-tailed document
    * distributions a mean/stddev z-score gets wrecked by. Output is the
    * input's columns plus (med, mad) for FLAGGED rows only. All
    * arithmetic is integer-exact for integer value columns (discrete
    * medians, |v-med|, k*mad), so the oracle hashes bit-equal.
    *
    * Scale posture: two discreteQuantiles passes (each a
    * map-side-combined count shuffle + value-domain-bounded window)
    * plus two broadcast joins of one-row-per-group median tables.
    */
  def madOutliers(df: DataFrame, groupCol: String, valCol: String,
      k: Long): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    val med = broadcast(discreteQuantiles(df, groupCol, valCol, Seq(0.5))
      .select(col(groupCol).as("__g"), col("q_value").as("med")))
    val withMed = df.join(med, col(groupCol) === col("__g")).drop("__g")
    val dev = withMed.withColumn("__dev", abs(col(valCol) - col("med")))
    val mad = broadcast(discreteQuantiles(dev, groupCol, "__dev", Seq(0.5))
      .select(col(groupCol).as("__g"), col("q_value").as("mad")))
    dev.join(mad, col(groupCol) === col("__g")).drop("__g")
      .filter(col("__dev") > lit(k) * col("mad"))
      .drop("__dev")
  }

  /** Per-group equi-width histogram: value v lands in bucket
    * floor((v-min)*buckets/(max-min+1)), clamped to buckets-1 — counts
    * per (group, bucket). The divide is done in doubles on BOTH engine
    * and oracle (products stay far below 2^53, so it is exact and
    * portable). One extent shuffle broadcast back + one count shuffle.
    */
  def histogram(df: DataFrame, groupCol: String, valCol: String,
      buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets must be positive: $buckets")
    val ext = broadcast(df.groupBy(col(groupCol).as("__g"))
      .agg(min(col(valCol)).as("__mn"), max(col(valCol)).as("__mx")))
    df.join(ext, col(groupCol) === col("__g"))
      .select(col(groupCol),
        least(
          floor(((col(valCol) - col("__mn")) * buckets).cast("double") /
            (col("__mx") - col("__mn") + 1)),
          lit(buckets - 1L)).as("bucket"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }
}
