package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shuffle-skew diagnostics: the key-frequency profile that decides,
  * BEFORE a big join or aggregation runs, which keys need salting and
  * by how much. At 100 TB a single hot key (the empty string, a null
  * sentinel, one viral domain) turns a 1000-task shuffle into one
  * straggler; this profile is the planning input for
  * `Extract.repartitionSalted`-style mitigation and for AQE skew-join
  * threshold tuning.
  *
  * All derived figures are integer-exact (BIGINT div / ppm) so the
  * profile replays bit-for-bit across engines: no double division,
  * no float ceil.
  */
object Skew {

  /** Per-key (count, share in ppm, recommended salt factor, skew
    * flag) for `keyCol`, where `targetPerTask` is the number of rows
    * one task should own (size shuffle partitions so partition bytes
    * fit executor memory; then targetPerTask = those rows).
    * salt_factor = ceil(cnt / target) is the number of sub-keys to
    * spread the key over; 1 means no salting needed. One groupBy
    * shuffle; the grand total joins back as a broadcast scalar.
    */
  def profile(df: DataFrame, keyCol: String, targetPerTask: Long): DataFrame = {
    require(targetPerTask > 0, s"targetPerTask must be positive, got $targetPerTask")
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("total"))
    counts.crossJoin(broadcast(total))
      .select(
        col("key"), col("cnt"),
        expr("cnt * 1000000 div total").as("share_ppm"),
        expr(s"(cnt + ${targetPerTask - 1}) div $targetPerTask").as("salt_factor"),
        (col("cnt") > targetPerTask).as("is_skewed"))
  }

  /** Skew-mitigated equi-join, output-identical to `left JOIN right ON
    * key`: the profile above decides each key's salt factor from the
    * LEFT (probe) side's frequencies; hot left rows spread across
    * factor sub-keys by a deterministic hash of `tieCol`, and the
    * right side replicates its rows once per sub-key (bounded fan-out:
    * sum of factors ≈ |left| / targetPerTask extra right rows). The
    * join key becomes (key, salt), so the hot key's rows land on
    * `factor` tasks instead of one straggler — the manual form of
    * AQE's skew-join split, usable where AQE can't see the skew
    * (pre-AQE stages, aggregations keyed downstream).
    *
    * The profile is a per-key aggregate (map-side combinable) and
    * broadcasts; cold keys keep factor 1 and pay nothing.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      tieCol: String, targetPerTask: Long): DataFrame = {
    val prof = profile(left, key, targetPerTask)
      .select(col("key").as(key), col("salt_factor"))
    val l = left.join(broadcast(prof), Seq(key), "left")
      .withColumn("__salt", pmod(
        graft.PortableHash.md5Hash60(
          concat(lit("salt:"), col(tieCol).cast("string"))),
        coalesce(col("salt_factor"), lit(1L))))
      .drop("salt_factor")
    val r = right.join(broadcast(prof), Seq(key), "left")
      .withColumn("__salt",
        explode(sequence(lit(0L), coalesce(col("salt_factor"), lit(1L)) - 1)))
      .drop("salt_factor")
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
