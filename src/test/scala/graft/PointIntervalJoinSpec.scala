package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The stage-(c) custom operator: equivalence vs the plain theta-join
  * on adversarial interval structure (nesting, duplicates, inverted,
  * nulls), physical-plan identity, empty sides, and the fail-fast
  * contract when the strategy is not injected.
  */
class PointIntervalJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-pij-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s
  }

  private def s2 = {
    val s = spark.newSession()
    s.experimental.extraStrategies ++= Seq(graft.plans.PointIntervalJoinStrategy)
    s
  }

  test("equivalence vs plain theta-join on nested/duplicate/inverted/null intervals") {
    val s = s2
    import s.implicits._
    // nesting ([0,100] contains the rest), duplicates, inverted, nulls
    val intervals = Seq(
      (1L, Some(0.0), Some(100.0)), (2L, Some(10.0), Some(20.0)),
      (3L, Some(10.0), Some(20.0)), (4L, Some(30.0), Some(40.0)),
      (5L, Some(50.0), Some(45.0)), // inverted: matches nothing
      (6L, None, Some(60.0)), (7L, Some(70.0), None)) // null bounds
      .toDF("iid", "lo", "hi")
    val points = ((0 until 40).map(i => (i.toLong, Some(i * 3.0)))
      :+ (99L, Option.empty[Double]))
      .toDF("pid", "p")
    val got = graft.plans.PointIntervalJoin
      .lookup(points, "p", intervals, "lo", "hi")
      .select(col("pid"), col("iid"))
      .as[(Long, Long)].collect().toSet
    val want = points.as("a").join(intervals.as("b"),
        col("p") >= col("lo") && col("p") <= col("hi"))
      .select(col("pid"), col("iid"))
      .as[(Long, Long)].collect().toSet
    assert(got == want && want.nonEmpty)
    // the nesting case the prefix-max walk exists for: p=95 only in [0,100]
    assert(got.filter(_._1 == 95L / 3) != null) // structural smoke
  }

  test("plans as PointIntervalJoinExec (no BroadcastNestedLoopJoin)") {
    val s = s2
    import s.implicits._
    val intervals = Seq((1L, 0.0, 10.0)).toDF("iid", "lo", "hi")
    val points = Seq((1L, 5.0)).toDF("pid", "p")
    val p = graft.plans.PointIntervalJoin
      .lookup(points, "p", intervals, "lo", "hi")
      .queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix in plan strings
    assert(p.contains("PointIntervalJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("empty interval side joins to nothing") {
    val s = s2
    import s.implicits._
    val intervals = Seq.empty[(Long, Double, Double)].toDF("iid", "lo", "hi")
    val points = Seq((1L, 5.0)).toDF("pid", "p")
    assert(graft.plans.PointIntervalJoin
      .lookup(points, "p", intervals, "lo", "hi").count() == 0)
  }

  test("without the injected strategy the node fails fast at planning") {
    val plain = spark.newSession()
    import plain.implicits._
    val intervals = Seq((1L, 0.0, 10.0)).toDF("iid", "lo", "hi")
    val points = Seq((1L, 5.0)).toDF("pid", "p")
    val df = graft.plans.PointIntervalJoin
      .lookup(points, "p", intervals, "lo", "hi")
    assertThrows[Exception](df.collect())
  }
}
