package graft

import graft.operators.{GlobalRank, Skew}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the scale-infrastructure operators: band-offset global
  * ranking must equal the single-partition row_number it replaces,
  * and the skew profile's integer arithmetic must be exact.
  */
class RankSkewSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-rankskew-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("rankBy reproduces global row_number across band widths") {
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    val rows = (0L until 400L).map(i => (i, rnd.nextInt(1000) - 500))
    val df = rows.toDF("id", "v")
    val expected = rows.sortBy(r => (r._2, r._1)).zipWithIndex
      .map { case ((id, v), i) => (id, v, i + 1L) }.toSet
    for (w <- Seq(1.0, 7.5, 100.0, 1e9)) {
      val got = GlobalRank.rankBy(df, "v", "id", w).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(got == expected, s"bandWidth=$w")
    }
  }

  test("rankBy ties broken by tie column, negative values band correctly") {
    import spark.implicits._
    val df = Seq((3L, -10), (1L, -10), (2L, -10), (4L, 0)).toDF("id", "v")
    val got = GlobalRank.rankBy(df, "v", "id", 4.0)
      .orderBy("global_rank").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(got == Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)))
  }

  test("skew profile: exact counts, ppm shares, ceil salt factors") {
    import spark.implicits._
    val df = (Seq.fill(120)("hot") ++ Seq.fill(50)("warm") ++ Seq.fill(3)("cold"))
      .toDF("k")
    val got = Skew.profile(df, "k", targetPerTask = 50L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSet
    val total = 173L
    assert(got == Set(
      ("hot", 120L, 120L * 1000000L / total, 3L, true),
      ("warm", 50L, 50L * 1000000L / total, 1L, false),
      ("cold", 3L, 3L * 1000000L / total, 1L, false)))
  }

  test("skew profile share_ppm sums to <= 1e6 and salt matches ceil") {
    import spark.implicits._
    val rnd = new scala.util.Random(11L)
    val df = (0 until 500).map(_ => "k" + rnd.nextInt(17)).toDF("k")
    val rows = Skew.profile(df, "k", targetPerTask = 20L).collect()
    assert(rows.map(_.getLong(2)).sum <= 1000000L)
    rows.foreach { r =>
      val cnt = r.getLong(1)
      assert(r.getLong(3) == (cnt + 19L) / 20L)
      assert(r.getBoolean(4) == (cnt > 20L))
    }
  }
}
