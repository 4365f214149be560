package graft

import graft.corpus.Allocation

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exact-size largest-remainder mixture allocation. */
class AllocationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-allocation-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // skewed groups: en 60, de 25, fr 10, zh 5
  private def docs(): DataFrame = {
    import spark.implicits._
    val rows = (0 until 60).map(i => (s"e$i", "en")) ++
      (0 until 25).map(i => (s"d$i", "de")) ++
      (0 until 10).map(i => (s"f$i", "fr")) ++
      (0 until 5).map(i => (s"z$i", "zh"))
    rows.toDF("doc_id", "lang")
  }

  test("selects exactly `total` rows with Hamilton quotas") {
    val out = Allocation.proportionalSelect(docs(), "lang", "doc_id", total = 17L)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.values.sum == 17L)
    // exact = 10.2 / 4.25 / 1.7 / 0.85; bases 10/4/1/0 sum 15, two seats
    // left -> largest remainders zh(.85) then fr(.7)
    assert(byLang == Map("en" -> 10L, "de" -> 4L, "fr" -> 2L, "zh" -> 1L))
  }

  test("deterministic and nested: bigger total selects a superset per group") {
    val d = docs()
    val a = Allocation.proportionalSelect(d, "lang", "doc_id", 17L)
      .select("doc_id").collect().map(_.getString(0)).sorted
    val b = Allocation.proportionalSelect(d, "lang", "doc_id", 17L)
      .select("doc_id").collect().map(_.getString(0)).sorted
    assert(a.sameElements(b))
    val big = Allocation.proportionalSelect(d, "lang", "doc_id", 60L)
      .select("doc_id").collect().map(_.getString(0)).toSet
    // nested per group wherever quota grows: quotas are monotone per
    // group only when every quota grows, which holds here (60 vs 17
    // scales every group's share up)
    assert(a.toSet.subsetOf(big))
    assert(big.size == 60)
  }

  test("total >= N selects everything; total = 0 selects nothing") {
    val d = docs()
    assert(Allocation.proportionalSelect(d, "lang", "doc_id", 100L).count() == 100L)
    assert(Allocation.proportionalSelect(d, "lang", "doc_id", 0L).count() == 0L)
  }
}
