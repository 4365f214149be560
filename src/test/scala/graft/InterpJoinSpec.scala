package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Interpolation join hand cases (midpoint, exact hits incl. the last
  * series point, strict nulls outside brackets, single-point series)
  * and the shuffle manifest's bijection/determinism laws.
  */
class InterpJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-interp-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("interpolation: midpoint, exact hits, strict nulls, single point") {
    import spark.implicits._
    val series = Seq(
      (1L, ts(10), 100.0, 100L), (1L, ts(20), 200.0, 101L),
      (2L, ts(10), 50.0, 102L))
      .toDF("user_id", "ts", "value", "event_id")
    val queries = Seq(
      (1L, ts(15), 0.0, 200L), (1L, ts(10), 0.0, 201L), (1L, ts(5), 0.0, 202L),
      (1L, ts(25), 0.0, 203L), (1L, ts(20), 0.0, 204L),
      (2L, ts(10), 0.0, 205L), (2L, ts(11), 0.0, 206L))
      .toDF("user_id", "ts", "value", "event_id")
    val got = graft.operators.InterpJoin.interpolate(
        series, queries, "user_id", "ts", "value", "event_id")
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got == Map(
      200L -> Some(150.0), // midpoint
      201L -> Some(100.0), // exact first point
      202L -> None,        // before series
      203L -> None,        // after series
      204L -> Some(200.0), // exact LAST point (no next bracket needed)
      205L -> Some(50.0),  // exact single point
      206L -> None))       // past single point
  }

  test("shuffle manifest: bijection onto rank space, deterministic, seed-sensitive") {
    import spark.implicits._
    val ids = (0L until 300L).toDF("doc_id")
    val m = graft.corpus.Shuffle.manifest(ids, "doc_id", "s1", shardSize = 64L)
      .as[(Long, Long, Long)].collect()
    assert(m.length == 300)
    // (shard, pos) pairs are exactly positions 0..299
    assert(m.map(r => r._2 * 64 + r._3).sorted.toSeq == (0L until 300L))
    // shards 0..3 full (64), shard 4 holds the 44 remainder
    val sizes = m.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes == Map(0L -> 64, 1L -> 64, 2L -> 64, 3L -> 64, 4L -> 44))
    val m2 = graft.corpus.Shuffle.manifest(ids, "doc_id", "s1", shardSize = 64L)
      .as[(Long, Long, Long)].collect()
    assert(m.sorted.toSeq == m2.sorted.toSeq)
    val other = graft.corpus.Shuffle.manifest(ids, "doc_id", "s2", shardSize = 64L)
      .as[(Long, Long, Long)].collect()
    assert(other.sorted.toSeq != m.sorted.toSeq)
  }
}
