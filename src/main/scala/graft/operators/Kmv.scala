package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al.,
  * "Counting distinct elements in a data stream", RANDOM 2002).
  *
  * estimate = (k-1) * M / h_k, where h_k is the k-th smallest distinct
  * hash over a space of size M; standard error ~ 1/sqrt(k-2). With
  * fewer than k distinct values the sketch IS the exact count.
  *
  * Why KMV instead of Spark's built-in approx_count_distinct (HLL++):
  * the estimate here is a pure function of an md5-derived hash and
  * exact double arithmetic, so it is REPRODUCIBLE across engines — a
  * DuckDB oracle replays the estimate bit-for-bit, and two runs on any
  * engine agree exactly. HLL implementations differ per engine and
  * version, which makes them un-auditable as pipeline contracts. The
  * sketch is mergeable (union = k smallest of the union), the same
  * property that makes it shuffle-friendly.
  *
  * Scale shape: distinct (group, hash) pairs — one shuffle with
  * map-side partial dedup — then a per-group top-k window over
  * bounded-cardinality groups. For a global (ungrouped) estimate the
  * orderBy+limit form plans as TakeOrderedAndProject (per-partition
  * top-k, driver merge of k rows).
  */
object Kmv {

  /** The full 60-bit portable hash space — the sketch uses the shared
    * PortableHash base UN-reduced (Sampling's mod-10^6 reduction would
    * collide long before real vocabularies do).
    */
  val HashSpace: Double = 1152921504606846976.0 // 2^60, exact in double

  /** KMV set-overlap estimate between the `valueCol` sets of two
    * slices (Beyer et al., SIGMOD 2007 multiset-operation synopses):
    * build the size-k union sketch (k smallest distinct hashes over
    * both slices, each hash tagged with per-slice membership), then
    *   jaccard  = |sketch hashes present in BOTH| / |sketch|
    *   est_union = (k-1)*M/h_k   (exact |sketch| below k)
    *   est_intersect = jaccard * est_union.
    * Deterministic and engine-replayable like the distinct sketch —
    * and exact whenever the union has fewer than k distinct values.
    * One row out: (n_sketch, k_intersect, est_union, jaccard,
    * est_intersect).
    *
    * Scale shape: one distinct-hash shuffle with map-side membership
    * ORs, then orderBy+limit(k) = TakeOrderedAndProject (per-partition
    * top-k, driver merge of k rows) — the slice-overlap report costs
    * one pass regardless of corpus size.
    */
  def overlapEstimate(df: DataFrame, sliceCol: String, valueCol: String,
      sliceA: String, sliceB: String, k: Int,
      salt: String = "kov"): DataFrame = {
    require(k >= 3, s"k must be >= 3, got $k")
    val hashed = df
      .filter(col(sliceCol).isin(sliceA, sliceB))
      .select(col(sliceCol).as("__s"),
        graft.PortableHash.salted60(col(valueCol), salt).as("hv"))
      .filter(col("hv").isNotNull)
      .groupBy(col("hv"))
      .agg(max(when(col("__s") === sliceA, 1L).otherwise(0L)).as("in_a"),
        max(when(col("__s") === sliceB, 1L).otherwise(0L)).as("in_b"))
    val sketch = hashed.orderBy(col("hv")).limit(k)
    val estUnion = when(col("n_sketch") < k, col("n_sketch").cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(HashSpace) / col("hk"))
    // an EMPTY sketch (neither slice present) is a defined result —
    // zero overlap of zero sets — not a row of NULLs: the zero-row
    // aggregate's NULL sum is coalesced and the 0/0 jaccard pinned
    val jaccard = when(col("n_sketch") === 0, lit(0.0))
      .otherwise(col("k_intersect").cast("double") / col("n_sketch"))
    sketch
      .agg(count(lit(1)).as("n_sketch"), max(col("hv")).as("hk"),
        coalesce(sum(col("in_a") * col("in_b")), lit(0L)).as("k_intersect"))
      .select(col("n_sketch"), col("k_intersect"),
        estUnion.as("est_union"),
        jaccard.as("jaccard"),
        (jaccard * estUnion).as("est_intersect"))
  }

  /** (groupCol, est_distinct): estimated distinct `valueCol` per group.
    * Exact count when a group has fewer than k distinct values. NULL
    * values are excluded (SQL COUNT(DISTINCT) semantics; a null hash
    * would otherwise rank first under Spark's nulls-first sort and
    * silently consume a top-k slot — DuckDB ranks nulls last).
    */
  def distinctPerGroup(df: DataFrame, groupCol: String, valueCol: String,
      k: Int, salt: String = "kmv"): DataFrame = {
    require(k >= 3, s"k must be >= 3, got $k")
    val hashed = df
      .select(col(groupCol).as("grp"),
        graft.PortableHash.salted60(col(valueCol), salt).as("hv"))
      .filter(col("hv").isNotNull)
      .distinct()
    val w = Window.partitionBy(col("grp")).orderBy(col("hv"))
    hashed
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .groupBy(col("grp"))
      .agg(max(col("hv")).as("hk"), count(lit(1)).as("n"))
      .select(col("grp").as(groupCol),
        when(col("n") < k, col("n").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(HashSpace) / col("hk"))
          .as("est_distinct"))
  }
}
