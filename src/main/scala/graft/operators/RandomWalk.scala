package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic fixed-length random walks over an edge table — the
  * DeepWalk/node2vec sampling primitive that turns a graph into
  * skip-gram training sequences. "Random" is derivable, not drawn: at
  * step k the walk at node v follows the neighbor whose dense rank
  * (neighbors ordered by dst) equals
  * `portable60(salt:walk_id:k:v) mod outdeg(v)` — so reruns, retries,
  * and any engine with md5 reproduce the identical corpus of walks
  * (the DuckDB oracle replays every step bit-for-bit).
  *
  * Scale shape: the ranked edge table (row_number + count windows,
  * one shuffle on src) is computed once and reused by every step;
  * each step is then ONE equi-join of the current walk frontier
  * against it on node = src. `length` is fixed and small, so the
  * total shuffle count is bounded up front and the plan tree stays
  * shallow — no data-dependent iteration, no checkpoint needed. A
  * walk reaching a node with no out-edges ends there (inner join);
  * the output keeps the steps taken so far.
  */
object RandomWalk {

  def walks(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      length: Int,
      salt: String): DataFrame = {
    val ranked = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .distinct()
      .withColumn("__r",
        row_number().over(Window.partitionBy("__src").orderBy("__dst")))
      .withColumn("__od", count(lit(1)).over(Window.partitionBy("__src")))
    var cur = ranked.select(col("__src").as("walk_id")).distinct()
      .withColumn("step", lit(0))
      .withColumn("node", col("walk_id"))
    var out = cur
    for (k <- 1 to length) {
      val pick = graft.PortableHash.md5Hash60(concat(
        lit(salt), lit(":"), col("walk_id").cast("string"),
        lit(":"), lit(k - 1).cast("string"),
        lit(":"), col("node").cast("string")))
      cur = cur.join(ranked,
          col("node") === col("__src") && col("__r") === pick % col("__od") + 1)
        .select(col("walk_id"), lit(k).as("step"), col("__dst").as("node"))
      out = out.union(cur)
    }
    out
  }
}
