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
  def triangles(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("v"))
      .filter(col("u") < col("v"))
      .distinct()
    val wedges = e.as("e1")
      .join(e.as("e2"), col("e1.u") === col("e2.u") && col("e1.v") < col("e2.v"))
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
    wedges
      .join(e.as("e3"), col("b") === col("e3.u") && col("c") === col("e3.v"))
      .select(col("a"), col("b"), col("c"))
  }
}
