package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle enumeration over an undirected edge list —
  * the clique-density probe for near-duplicate graphs (a triangle-rich
  * overlap graph means transitive boilerplate families; triangle
  * counts per component separate template clusters from chains).
  *
  * Algorithm: canonical id-orientation (u < v), join oriented edges
  * sharing their low endpoint into wedges (a < b < c), close each
  * wedge with one more equi-join — two shuffles, no cartesian, output
  * each triangle exactly once as (a, b, c). Wedge fan-out is bounded
  * by the max oriented out-degree; at web scale the standard
  * hardening is DEGREE orientation (low-degree -> high-degree, which
  * bounds oriented out-degree by ~sqrt(m)) — one extra degree join,
  * same plan shape, noted here because id orientation is the form the
  * relational oracle replays verbatim.
  */
object Triangles {

  /** (a, b, c) with a < b < c: each triangle of the undirected graph
    * exactly once. Self-loops and duplicate/reversed edges are
    * normalized away first.
    */
  def triangles(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    trianglesOf(oriented(edges, srcCol, dstCol))

  /** Canonical (u < v) oriented, deduped, self-loop-free edge frame. */
  private def oriented(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("v"))
      .filter(col("u") < col("v"))
      .distinct()

  private def trianglesOf(e: DataFrame): DataFrame = {
    val wedges = e.as("e1")
      .join(e.as("e2"), col("e1.u") === col("e2.u") && col("e1.v") < col("e2.v"))
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
    wedges
      .join(e.as("e3"), col("b") === col("e3.u") && col("c") === col("e3.v"))
      .select(col("a"), col("b"), col("c"))
  }

  /** Per-node local clustering coefficient — the "how clique-like is
    * this node's neighborhood" score: coeff(v) = 2*T(v) / (deg(v) *
    * (deg(v)-1)), T(v) = triangles through v; degree-1 nodes score 0.
    * A near-dup graph node with high degree but near-zero coefficient
    * is a hub stitching UNRELATED duplicate families (e.g. a
    * boilerplate page matching everything) — the classic false-merge
    * suspect that pure connected components cannot see.
    *
    * Cross-engine exactness: T and deg are exact integers; the single
    * IEEE division of two integers below 2^53 is bit-identical on any
    * IEEE engine, so the double output is directly comparable.
    *
    * Scale posture: the triangle enumeration above (two bounded
    * equi-joins) + one explode to (node, 1) + two map-side-combined
    * counts + one broadcast-sized join per node — no step beyond the
    * triangle join itself, which degree orientation bounds at web
    * scale (see scaladoc above).
    */
  def clusteringCoefficient(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val e = oriented(edges, srcCol, dstCol)
    val deg = e.select(col("u").as("node"))
      .union(e.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val tri = trianglesOf(e)
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("tri_cnt"))
    deg.join(tri, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("tri_cnt"), lit(0L)).as("tri_cnt"))
      .withColumn("coeff",
        when(col("deg") >= 2,
          (col("tri_cnt") * 2).cast("double") /
            (col("deg") * (col("deg") - 1)).cast("double"))
          .otherwise(lit(0.0)))
  }
}
