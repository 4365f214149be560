package graft.lineage

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Iceberg-shaped partition transforms — the functions a hidden
  * partition spec applies to derive partition values from row values
  * (`bucket(N, col)`, `truncate(W, col)`, `day(ts)`), reproduced as
  * portable Column expressions so layout decisions (write
  * partitioning, manifest pruning, co-located joins) can be computed,
  * audited, and oracled engine-side.
  *
  * Deviation from Iceberg, on purpose: Iceberg's bucket() is
  * murmur3-based; this engine's portable contract is the 60-bit md5
  * hash ([[graft.PortableHash]]) so a DuckDB oracle replays every
  * partition assignment bit-for-bit. The SHAPE (stable hash mod N,
  * width truncation, calendar day) is what transfers; swap the hash
  * when writing through a real Iceberg catalog.
  *
  * All three are scan-stage expressions: zero shuffles to compute, and
  * grouping by them is the partition-sized aggregation a planner uses
  * for pruning stats.
  */
object PartitionTransforms {

  /** Stable hash bucket in [0, n). */
  def bucket(n: Int, c: Column): Column = {
    require(n >= 1, s"bucket count must be positive: $n")
    pmod(graft.PortableHash.md5Hash60(c.cast("string")), lit(n.toLong))
  }

  /** Width truncation for integral values: floor-to-multiple keeps
    * ordering, so range predicates prune truncated partitions.
    * Negative values floor toward -infinity (Iceberg semantics), not
    * toward zero.
    */
  def truncate(width: Long, c: Column): Column = {
    require(width >= 1, s"truncate width must be positive: $width")
    // integer-exact floor-to-multiple: pmod is non-negative, so the
    // subtraction floors toward -infinity for negatives too (no double
    // round-trip — exact over the full long range)
    c.cast("long") - pmod(c.cast("long"), lit(width))
  }

  /** Calendar day (UTC date) of a timestamp. */
  def day(ts: Column): Column = to_date(ts)
}
