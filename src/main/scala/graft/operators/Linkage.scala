package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter record-linkage scoring (the 1969 probabilistic
  * model behind every serious entity-resolution matcher): each field
  * comparison contributes a log-likelihood-ratio weight —
  * ln(m/u) when the field AGREES (m = P(agree | match),
  * u = P(agree | non-match)), ln((1-m)/(1-u)) when it disagrees —
  * and the pair's score is the sum; a threshold splits match /
  * non-match (the clerical-review band is a second threshold the
  * caller can apply).
  *
  * Weights are precomputed DRIVER-SIDE into integer micro-nats and
  * ride into the plan as literals, so the distributed sum is exact
  * 64-bit addition (order-immune, engine-exact — the DuckDB oracle
  * interpolates the same literals; no ln is ever taken per-row or
  * cross-engine).
  *
  * Scale shape: scoring decorates an existing CANDIDATE pair table
  * (sorted-neighborhood, minhash bands, q-gram prefixes — never all
  * pairs); the two attribute joins are equi-joins on the pair ids.
  */
object Linkage {

  /** ln(m/u) in floor'd integer micro-nats. */
  def microNatWeight(m: Double, u: Double): Long = {
    require(m > 0 && m < 1 && u > 0 && u < 1, s"m=$m u=$u must be in (0,1)")
    math.floor(StrictMath.log(m / u) * 1e6).toLong
  }

  /** Attach per-field agreement weights to candidate `pairs`
    * (id_a, id_b): `attrs` joins on both sides with `_a`/`_b` column
    * suffixes, `fields` are (agreePredicate, m, u) with the predicate
    * written over the suffixed columns.
    */
  def scorePairs(
      pairs: DataFrame,
      attrs: DataFrame,
      idCol: String,
      fields: Seq[(Column, Double, Double)],
      thresholdMicro: Long): DataFrame = {
    def suffixed(sfx: String, idAs: String): DataFrame =
      attrs.columns.filter(_ != idCol).foldLeft(attrs) { (df, c) =>
        df.withColumnRenamed(c, c + sfx)
      }.withColumnRenamed(idCol, idAs)
    val joined = pairs.select(col("id_a"), col("id_b"))
      .join(suffixed("_a", "id_a"), "id_a")
      .join(suffixed("_b", "id_b"), "id_b")
    val score = fields.map { case (agree, m, u) =>
      when(agree, lit(microNatWeight(m, u)))
        .otherwise(lit(microNatWeight(1.0 - m, 1.0 - u)))
    }.reduce(_ + _)
    joined.select(col("id_a"), col("id_b"), score.as("score_micro"),
      (score >= thresholdMicro).as("is_match"))
  }
}
