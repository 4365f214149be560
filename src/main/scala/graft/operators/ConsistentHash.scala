package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.PortableHash

/** Consistent-hash shard assignment (Karger ring) — the placement
  * function whose defining property is MINIMAL MOVEMENT: growing an
  * N-shard layout to N+1 relocates ~1/(N+1) of the keys, where the
  * naive `hash % N` relocates almost everything. At 100 TB that is
  * the difference between topping up one new shard and rewriting the
  * corpus — the routing layer for sharded dedup indexes, ANN
  * partitions, and resumable output layouts.
  *
  * Construction (deterministic, oracle-replayable): each shard owns
  * `vnodes` ring positions p(s, v) = md5-portable-60bit("ring:s:v");
  * a key sits at p(k) = hash60 of its id and is owned by the vnode
  * with the smallest position >= p(k), wrapping to the ring's global
  * minimum. Virtual nodes smooth the arc-length variance (stddev of
  * shard load ~ 1/sqrt(vnodes)).
  *
  * Scale posture: the ring is nShards * vnodes rows — broadcast-tiny
  * by construction (the IVF-codebook pattern); assignment is one
  * broadcast cross join with bounded fan-out and a map-side-combined
  * min(struct) argmin per key. No shuffle of the keyed data at all
  * unless the caller repartitions by the resulting shard.
  */
object ConsistentHash {

  /** (shard, vnode, pos) ring table. */
  def ring(spark: SparkSession, nShards: Int, vnodes: Int): DataFrame = {
    require(nShards >= 1 && vnodes >= 1, s"bad ring $nShards x $vnodes")
    spark.range(nShards.toLong * vnodes)
      .select((col("id") / vnodes).cast("long").as("shard"),
        (col("id") % vnodes).cast("long").as("vnode"))
      .select(col("shard"), col("vnode"),
        PortableHash.md5Hash60(concat(lit("ring:"), col("shard").cast("string"),
          lit(":"), col("vnode").cast("string"))).as("pos"))
  }

  /** (input columns..., shard) under the nShards x vnodes ring.
    * The ring collapses to ONE broadcast row holding the
    * position-sorted (pos, shard, vnode) array; ownership is then a
    * record-local array filter + head — zero shuffles of the keyed
    * data, fully inside whole-stage codegen.
    */
  def assign(df: DataFrame, idCol: String, nShards: Int, vnodes: Int): DataFrame = {
    val ringRow = ring(df.sparkSession, nShards, vnodes)
      .agg(sort_array(collect_list(
        struct(col("pos"), col("shard"), col("vnode")))).as("__ring"))
    df.crossJoin(broadcast(ringRow))
      .withColumn("__kpos",
        PortableHash.md5Hash60(concat(lit("doc:"), col(idCol).cast("string"))))
      .withColumn("__cand",
        filter(col("__ring"), e => e("pos") >= col("__kpos")))
      .withColumn("shard",
        when(size(col("__cand")) > 0, element_at(col("__cand"), 1)("shard"))
          .otherwise(element_at(col("__ring"), 1)("shard")))
      .drop("__ring", "__kpos", "__cand")
  }

  /** Per-key rebalance audit growing nOld -> nNew shards:
    * (id, old_shard, new_shard, moved). The moved fraction
    * concentrates near (nNew - nOld)/nNew — the minimal-movement
    * guarantee, spec-gated.
    */
  def rebalanceAudit(df: DataFrame, idCol: String, nOld: Int, nNew: Int,
      vnodes: Int): DataFrame = {
    val before = assign(df, idCol, nOld, vnodes)
      .withColumnRenamed("shard", "old_shard")
    val after = assign(df, idCol, nNew, vnodes)
      .select(col(idCol), col("shard").as("new_shard"))
    before.join(after, Seq(idCol))
      .withColumn("moved", (col("old_shard") =!= col("new_shard")).cast("int"))
  }
}
