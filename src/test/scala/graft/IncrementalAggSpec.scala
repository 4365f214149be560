package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Incremental aggregate maintenance laws: refresh(state(A), B) ==
  * state(A union B); empty-delta no-op; new-group appearance; batch
  * associativity (two sequential deltas == one combined).
  */
class IncrementalAggSpec extends AnyFunSuite {
  import graft.operators.IncrementalAgg._

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-incagg-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def df(rows: Seq[(String, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("k", "v")
  }

  private def snap(d: DataFrame): Set[(String, Long, Long, Long, Long)] = {
    import spark.implicits._
    d.as[(String, Long, Long, Long, Long)].collect().toSet
  }

  private val base = Seq("a" -> 5L, "a" -> 9L, "b" -> 2L, "b" -> 2L, "c" -> 7L)
  private val delta = Seq("a" -> 1L, "c" -> 30L, "d" -> 4L)

  test("refresh equals full recompute, including the new group d") {
    val got = snap(refresh(state(df(base), Seq("k"), "v"), df(delta), Seq("k"), "v"))
    assert(got == snap(state(df(base ++ delta), Seq("k"), "v")))
    assert(got.contains(("d", 1L, 4L, 4L, 4L)))
    assert(got.contains(("a", 3L, 15L, 1L, 9L)))
  }

  test("empty delta is a no-op") {
    val s0 = state(df(base), Seq("k"), "v")
    assert(snap(refresh(s0, df(Seq.empty), Seq("k"), "v")) == snap(s0))
  }

  test("two sequential deltas equal the combined batch") {
    val (d1, d2) = delta.splitAt(2)
    val s0 = state(df(base), Seq("k"), "v")
    val seq2 = refresh(refresh(s0, df(d1), Seq("k"), "v"), df(d2), Seq("k"), "v")
    assert(snap(seq2) == snap(refresh(s0, df(delta), Seq("k"), "v")))
  }
}
