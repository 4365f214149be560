package graft

import graft.eval.Eval

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Eval-metric operators, each checked against an independent
  * driver-side exact reimplementation:
  *  1. aucBinary == brute O(n²) concordant/tied pair counting
  *     (ties count half), NULL on one-class groups;
  *  2. cohenKappa == driver-computed (po - pe) / (1 - pe), 1.0 on
  *     perfect agreement;
  *  3. ndcgAtK == driver DCG/IDCG replay with the same literal weight
  *     tables, NULL nDCG + rr_micro 0 on all-irrelevant queries.
  */
class EvalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-eval-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def checkProp(p: Prop, n: Int = 12): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("aucBinary equals the brute-force tie-aware pair count per group") {
    import spark.implicits._
    checkProp(Prop.forAll(Gen.choose(0L, 5000L)) { seed =>
      val rng = new Random(seed)
      val rows = (0 until 40 + rng.nextInt(40)).map { _ =>
        ("g" + rng.nextInt(3), rng.nextInt(8).toLong, rng.nextBoolean())
      }
      val got = Eval.aucBinary(rows.toDF("grp", "s", "y"), "grp", "s", "y")
        .collect().map(r => (r.getString(0),
          (r.getLong(1), r.getLong(2), r.getLong(3),
            if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
      val want = rows.groupBy(_._1).map { case (g, rs) =>
        val pos = rs.filter(_._3).map(_._2)
        val neg = rs.filterNot(_._3).map(_._2)
        val conc = (for (p <- pos; n <- neg if p > n) yield 1L).sum
        val tied = (for (p <- pos; n <- neg if p == n) yield 1L).sum
        val u2 = 2L * conc + tied
        val auc = if (pos.isEmpty || neg.isEmpty) None
          else Some(u2.toDouble / (2L * pos.size * neg.size).toDouble)
        g -> ((pos.size.toLong, neg.size.toLong, u2, auc))
      }
      got == want
    })
  }

  test("aucBinary: perfect separation gives 1.0, reversed gives 0.0") {
    import spark.implicits._
    val df = Seq(("g", 10L, true), ("g", 11L, true), ("g", 1L, false),
      ("g", 2L, false)).toDF("grp", "s", "y")
    assert(Eval.aucBinary(df, "grp", "s", "y").collect()(0).getDouble(4) == 1.0)
    val rev = Seq(("g", 1L, true), ("g", 2L, true), ("g", 10L, false),
      ("g", 11L, false)).toDF("grp", "s", "y")
    assert(Eval.aucBinary(rev, "grp", "s", "y").collect()(0).getDouble(4) == 0.0)
  }

  test("cohenKappa equals the driver formula; perfect agreement is 1.0") {
    import spark.implicits._
    checkProp(Prop.forAll(Gen.choose(0L, 5000L)) { seed =>
      val rng = new Random(seed)
      val rows = (0 until 30 + rng.nextInt(50)).map { _ =>
        ("c" + rng.nextInt(3), "c" + rng.nextInt(3))
      }
      val r = Eval.cohenKappa(rows.toDF("a", "b"), "a", "b").collect()(0)
      val n = rows.size.toLong
      val agree = rows.count { case (a, b) => a == b }.toLong
      val classes = (rows.map(_._1) ++ rows.map(_._2)).distinct
      val peNum = classes.map(c =>
        rows.count(_._1 == c).toLong * rows.count(_._2 == c).toLong).sum
      val po = agree.toDouble / n.toDouble
      val pe = peNum.toDouble / (n * n).toDouble
      r.getLong(0) == n && r.getLong(1) == agree && r.getLong(2) == peNum &&
        r.getDouble(5) == (po - pe) / (1.0 - pe)
    })
    val perfect = Seq(("x", "x"), ("y", "y"), ("z", "z")).toDF("a", "b")
    assert(Eval.cohenKappa(perfect, "a", "b").collect()(0).getDouble(5) == 1.0)
  }

  test("ndcgAtK equals the driver DCG/IDCG replay with literal weights") {
    import spark.implicits._
    val wt = Eval.dcgWeightsMicro
    val rrw = Eval.rrWeightsMicro
    checkProp(Prop.forAll(Gen.choose(0L, 5000L)) { seed =>
      val rng = new Random(seed)
      val rows = (0 until 50 + rng.nextInt(50)).map { i =>
        (rng.nextInt(4).toLong, i.toLong, rng.nextInt(20).toLong,
          rng.nextInt(3).toLong)
      }
      val got = Eval.ndcgAtK(rows.toDF("q", "doc", "score", "rel"),
          "q", "doc", "score", "rel", k = 10)
        .collect().map(r => (r.getLong(0),
          (r.getLong(1), r.getLong(2),
            if (r.isNullAt(3)) None else Some(r.getDouble(3)),
            r.getLong(4)))).toMap
      val want = rows.groupBy(_._1).map { case (q, rs) =>
        val byScore = rs.sortBy(r => (-r._3, r._2)).take(10)
        val byRel = rs.sortBy(r => (-r._4, r._2)).take(10)
        val dcg = byScore.zipWithIndex.map { case (r, i) => r._4 * wt(i) }.sum
        val idcg = byRel.zipWithIndex.map { case (r, i) => r._4 * wt(i) }.sum
        val firstRel = byScore.zipWithIndex.collectFirst {
          case (r, i) if r._4 > 0 => i }
        val ndcg = if (idcg == 0) None else Some(dcg.toDouble / idcg.toDouble)
        q -> ((dcg, idcg, ndcg, firstRel.map(rrw).getOrElse(0L)))
      }
      got == want
    })
  }

  test("ndcgAtK: all-irrelevant query yields NULL nDCG and rr_micro 0") {
    import spark.implicits._
    val df = Seq((1L, 1L, 5L, 0L), (1L, 2L, 4L, 0L)).toDF("q", "doc", "score", "rel")
    val r = Eval.ndcgAtK(df, "q", "doc", "score", "rel").collect()(0)
    assert(r.isNullAt(3) && r.getLong(4) == 0L && r.getLong(1) == 0L)
  }
}
