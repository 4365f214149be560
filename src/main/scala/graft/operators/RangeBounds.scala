package graft.operators

import graft.corpus.Sampling

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampled range-partition boundaries — the primitive behind every
  * balanced global sort / write-ordered layout at 100 TB.
  *
  * Spark's own `RangePartitioner` does exactly this internally (sample
  * → sort the sample → pick evenly-spaced order statistics → broadcast
  * the bounds), but it is sealed inside `orderBy` and its sample is
  * non-deterministic (seeded per-partition reservoirs over an opaque
  * split layout), so two runs of the same job can produce different
  * file boundaries. This operator makes the primitive first-class and
  * DETERMINISTIC: the sample is the portable md5 hash filter
  * ([[Sampling.hashSample]]), the order statistics are exact ranks over
  * that sample, and the realized occupancy of every bucket is emitted
  * alongside the bounds — so the balance claim is itself auditable
  * (the no-silent-caps posture), and a DuckDB oracle replays the exact
  * boundary values and counts.
  *
  * Scale posture: the sample is the bounded small side by construction
  * (pick `sampleRate` so rate x |input| fits one task — the same
  * contract Spark's RangePartitioner satisfies by collecting its sample
  * to the driver; here it never leaves the executors). The single
  * unpartitioned ranking window runs over the SAMPLE ONLY; the full
  * input is touched exactly twice, both embarrassingly parallel: the
  * codegen'd hash filter of the sampling scan and the bucket-assignment
  * map against the broadcast bounds array. One final groupBy(bucket)
  * computes the occupancy (map-side combinable, `buckets` distinct
  * keys).
  */
object RangeBounds {

  /** (bucket, bound_lo, n_rows): the bucket each input row would land
    * in under `buckets`-way range partitioning of `valueCol`, with the
    * bucket's lower boundary value (null for bucket 0) and realized row
    * count. Boundaries are the sample's order statistics at positions
    * floor(i * n / buckets), i = 1..buckets-1 (value-only comparison,
    * like RangePartitioner: rows equal to a boundary land in the upper
    * bucket iff the boundary is <= their value). Requires the sample to
    * hold at least `buckets` rows (positions collide below that and the
    * bound list comes up short — sizing the sample is the caller's
    * contract, as it is for RangePartitioner).
    *
    * `valueCol` must be an INTEGRAL type (byte/short/int/long): bounds
    * and buckets are computed in long arithmetic, and silently casting a
    * double/decimal column would truncate values and shift every bucket
    * boundary. Enforced with a loud schema require; fractional callers
    * should pre-scale to integers (e.g. cents) and own the rounding.
    */
  def boundsAndOccupancy(
      df: DataFrame,
      valueCol: String,
      tieCol: String,
      buckets: Int,
      sampleRate: Double,
      salt: String = "rangebounds"): DataFrame = {
    require(buckets > 1, s"buckets must be > 1, got $buckets")
    val vType = df.schema(valueCol).dataType
    require(
      Set[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.ByteType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType).contains(vType),
      s"valueCol '$valueCol' must be integral (byte/short/int/long), got " +
        s"${vType.simpleString}: casting fractional values to long would " +
        "silently truncate and shift bucket boundaries")
    val rows = df.select(col(tieCol).as("__tie"),
      col(valueCol).cast("long").as("__v"))
    val sample = Sampling.hashSample(rows, "__tie", sampleRate, salt)
    // exact ranks over the bounded sample: the one unpartitioned sort
    // in the construction, deliberately confined to the small side
    val ranked = sample.withColumn("__rn",
      row_number().over(Window.orderBy(col("__v"), col("__tie"))))
    val n = sample.agg(count(lit(1)).as("__n"))
    // order-statistic positions floor(i*n/buckets) as rows, joined back
    // to the ranked sample — no driver round-trip, no collect
    val positions = n.select(
      explode(sequence(lit(1), lit(buckets - 1))).as("__i"), col("__n"))
      .select(col("__i"), (col("__i") * col("__n") / buckets).cast("long").as("__pos"))
    val boundsRow = ranked.join(broadcast(positions), col("__rn") === col("__pos"))
      .groupBy()
      .agg(sort_array(collect_list(struct(col("__i"), col("__v")))).as("__bs"))
      .select(transform(col("__bs"), b => b("__v")).as("__bounds"))
    rows
      .crossJoin(broadcast(boundsRow))
      .select(col("__v"),
        size(filter(col("__bounds"), b => b <= col("__v"))).cast("long").as("bucket"),
        col("__bounds"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"), first(col("__bounds")).as("__bounds"))
      .select(col("bucket"),
        when(col("bucket") === 0, lit(null).cast("long"))
          .otherwise(element_at(col("__bounds"), col("bucket").cast("int"))).as("bound_lo"),
        col("n_rows"))
  }
}
