package graft.operators

import org.apache.spark.sql.DataFrame

/** Incremental maintenance of an equi-join view — the delta algebra
  * that keeps a materialized A ⋈ B current without ever recomputing
  * it: when disjoint deltas ΔA, ΔB arrive,
  *
  *   Δ(A ⋈ B) = (ΔA ⋈ B) ∪ (A ⋈ ΔB) ∪ (ΔA ⋈ ΔB)
  *
  * (A, B are the PRE-delta bases). The companion to
  * `IncrementalAgg` (aggregates) for the join half of a refresh
  * pipeline.
  *
  * Scale shape: three equi-joins, every one with a DELTA side — small
  * by construction, so AQE broadcasts it and the 100 TB base side is
  * never shuffled; the base ⋈ base product (the expensive part the
  * view already holds) is exactly what never runs.
  */
object IncrementalJoin {

  def joinDelta(
      baseA: DataFrame,
      deltaA: DataFrame,
      baseB: DataFrame,
      deltaB: DataFrame,
      key: String): DataFrame =
    deltaA.join(baseB, Seq(key))
      .unionByName(baseA.join(deltaB, Seq(key)))
      .unionByName(deltaA.join(deltaB, Seq(key)))
}
