package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch (Flajolet, Fusy, Gandouet,
  * Meunier, "HyperLogLog: the analysis of a near-optimal cardinality
  * estimation algorithm", AofA 2007) over the shared portable 60-bit
  * hash, with a fixed m=64 register file per group.
  *
  * Complements [[Kmv]]: KMV is exact below k and replays its estimate
  * as pure integer/division arithmetic, but its sketch state is a
  * top-k of distinct hashes — building it costs a distinct shuffle and
  * a per-group window. HLL's state is a FIXED 64-slot register array
  * whose update is a plain `max` — no input dedup, no window, fully
  * map-side combinable — which is why it is the industry default for
  * distinct counts over 10^12-row streams. Standard error ~ 1.04 /
  * sqrt(64) = 13%.
  *
  * Cross-engine determinism: the register state is integer-exact (max
  * of bit-lengths), and the harmonic sum is accumulated as the exact
  * integer `sum(2^(55-M_j))` — a BIGINT, immune to float summation
  * order — so the DuckDB oracle replays the estimate bit-for-bit. Bit
  * length is `length(bin(w))` (binary string without leading zeros —
  * identical in Spark and DuckDB). The only transcendental, the
  * small-range linear-counting `ln(m/V)` correction, cannot be
  * guaranteed bit-equal across engines' libm; the driver-oracled query
  * sketches a set large enough (thousands of distinct per group
  * against 64 registers) that every register is occupied w.h.p. and
  * the correction branch is never taken. The branch itself is
  * implemented on both sides and unit-gated engine-side (HllSpec).
  *
  * Scale shape: one groupBy((grp, bucket)) max — map-side partial max
  * collapses each input partition to at most |groups| x 64 rows before
  * the shuffle — then a per-group sum over exactly 64 rows. Nothing
  * scales with input size past the first partial aggregate.
  */
object Hll {

  /** log2(m): 6 -> m = 64 registers. */
  val P: Int = 6
  val M: Int = 1 << P

  /** Bits of the 60-bit hash left after the bucket index. */
  val WBits: Int = 60 - P

  /** alpha_64 (the paper's bias constant for m = 64). */
  val Alpha: Double = 0.709

  /** Mergeable register state: (grp, bucket, mj) with mj = max over
    * the bucket's values of (1 + leading-zero count of the low 54
    * hash bits), in [1, 55]. Buckets no value hashed into are absent
    * (estimateFromRegisters accounts them as M_j = 0). Merging two
    * sketches of the same group = groupBy(grp, bucket).max(mj) —
    * gated by HllSpec's split-merge property.
    */
  def registers(df: DataFrame, groupCol: String, valueCol: String,
      salt: String = "hll"): DataFrame = {
    val h = graft.PortableHash.salted60(col(valueCol), salt)
    val w = h.bitwiseAND(lit((1L << WBits) - 1))
    val rho = when(w === 0L, lit(WBits + 1))
      .otherwise(lit(WBits + 1) - length(bin(w)))
    df.select(col(groupCol).as("grp"), h.as("h"), rho.as("rho"))
      .filter(col("h").isNotNull)
      .select(col("grp"), shiftright(col("h"), WBits).as("bucket"), col("rho"))
      .groupBy(col("grp"), col("bucket"))
      .agg(max(col("rho")).cast("long").as("mj"))
  }

  /** (grp, v_zero, z_scaled, est_distinct) from a register frame:
    * z_scaled = sum(2^(55-M_j)) over all 64 registers (absent register
    * = 2^55), an exact BIGINT <= 64 * 2^55 < 2^62; the estimate is
    * alpha * m^2 * 2^55 / z_scaled with the linear-counting correction
    * m * ln(m / V) when the raw estimate <= 2.5m and V empty registers
    * remain.
    */
  def estimateFromRegisters(regs: DataFrame): DataFrame = {
    val twoPowW = (1L << (WBits + 1)).toDouble // 2^55, exact
    val g = regs
      .groupBy(col("grp"))
      .agg(
        (sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST(${WBits + 1} - mj AS INT))")) +
          (lit(M.toLong) - count(lit(1))) * lit(1L << (WBits + 1))).as("z_scaled"),
        (lit(M.toLong) - count(lit(1))).as("v_zero"))
    val estRaw = (lit(Alpha) * lit(M.toDouble * M.toDouble) * lit(twoPowW)) /
      col("z_scaled").cast("double")
    g.select(col("grp"), col("v_zero"), col("z_scaled"),
      when(estRaw <= lit(2.5 * M) && col("v_zero") > 0,
        lit(M.toDouble) * log(lit(M.toDouble) / col("v_zero").cast("double")))
        .otherwise(estRaw).as("est_distinct"))
  }

  /** (groupCol, v_zero, z_scaled, est_distinct): estimated distinct
    * `valueCol` per group. Input need not be deduplicated.
    */
  def distinctPerGroup(df: DataFrame, groupCol: String, valueCol: String,
      salt: String = "hll"): DataFrame =
    estimateFromRegisters(registers(df, groupCol, valueCol, salt))
      .withColumnRenamed("grp", groupCol)

  /** Sliding-window cardinality — distinct `valueCol` over the
    * trailing `windowDays` days ending at each observed day: the
    * "distinct users last N days" dashboard primitive, and THE reason
    * the register state is mergeable — per-day sketches are built once
    * and each window is a register-max MERGE, never a re-scan of N
    * days of raw rows. Day fan-out is exactly `windowDays` (each day's
    * 64-row register file is served to the days it covers), so the
    * merged frame is days x windowDays x 64 rows regardless of input
    * size.
    *
    * Unlike [[distinctPerGroup]]'s driver-oracled query (sized so the
    * linear-counting branch never fires), small per-window
    * cardinalities make the `m * ln(m/V)` correction REACHABLE here,
    * so this estimate discretizes that ln to integer micro-nats —
    * floor(ln(m/V) * 1e6 + 0.5) / 1e6, the engine-wide portable-ln
    * convention — on both engines.
    */
  def slidingDistinct(df: DataFrame, tsCol: String, valueCol: String,
      windowDays: Int, salt: String = "hllw"): DataFrame = {
    require(windowDays >= 1, s"bad windowDays=$windowDays")
    val byDay = df.select(to_date(col(tsCol)).as("day"), col(valueCol).as("v"))
    val regs = registers(byDay, "day", "v", salt)
    val days = byDay.select(col("day")).distinct()
    val served = regs
      .select(col("grp"), col("bucket"), col("mj"),
        explode(sequence(lit(0), lit(windowDays - 1))).as("off"))
      .select(date_add(col("grp"), col("off")).as("day"),
        col("bucket"), col("mj"))
      .join(days, Seq("day"), "leftsemi")
    val merged = served.groupBy(col("day"), col("bucket"))
      .agg(max(col("mj")).as("mj"))
    val g = merged.groupBy(col("day"))
      .agg(
        (sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST(${WBits + 1} - mj AS INT))")) +
          (lit(M.toLong) - count(lit(1))) * lit(1L << (WBits + 1))).as("z_scaled"),
        (lit(M.toLong) - count(lit(1))).as("v_zero"))
    val twoPowW = (1L << (WBits + 1)).toDouble
    val estRaw = (lit(Alpha) * lit(M.toDouble * M.toDouble) * lit(twoPowW)) /
      col("z_scaled").cast("double")
    g.select(col("day"), col("v_zero"), col("z_scaled"),
      when(estRaw <= lit(2.5 * M) && col("v_zero") > 0,
        lit(M.toDouble) *
          (floor(log(lit(M.toDouble) / col("v_zero").cast("double")) * 1e6 + 0.5)
            / 1e6))
        .otherwise(estRaw).as("est_distinct"))
  }
}
