package graft

import graft.ann.Pca
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PcaSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-pca-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("powerIterate finds the dominant eigenvector of a known matrix") {
    // diag(9, 4, 1) + a small symmetric perturbation: dominant
    // eigenvector stays near e1
    val cov = Array(
      Array(9.0, 0.3, 0.1),
      Array(0.3, 4.0, 0.2),
      Array(0.1, 0.2, 1.0))
    val w = Pca.powerIterate(cov, 30)
    assert(math.abs(w(0)) > 0.99, w.toSeq.toString)
    assert(w(0) > 0, "sign fix: first nonzero component positive")
    val nrm = math.sqrt(w.map(x => x * x).sum)
    assert(math.abs(nrm - 1.0) < 1e-12)
  }

  test("projection recovers a planted dominant direction") {
    import spark.implicits._
    // points = t * u + small noise, u a fixed unit direction in 8 dims:
    // the top component must align with u (up to sign)
    val dim = 8
    val u = Array.tabulate(dim)(j => math.sin(j + 1.0))
    val un = { val n = math.sqrt(u.map(x => x * x).sum); u.map(_ / n) }
    val rng = new scala.util.Random(7)
    val rows = (0 until 400).map { i =>
      val t = rng.nextGaussian() * 5
      (i.toLong, Seq.tabulate(dim)(j => (t * un(j) + rng.nextGaussian() * 0.05).toFloat))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val model = Pca.fit(spark, emb, "vec_id", "embedding", iters = 20)
    val cosine = model.component.zip(un).map { case (a, b) => a * b }.sum
    assert(math.abs(cosine) > 0.995, s"cos=$cosine comp=${model.component.toSeq}")
    // projections match the per-row definition exactly
    val got = Pca.project(spark, emb, "vec_id", "embedding", iters = 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for ((id, v) <- rows.take(20)) {
      val x = v.map(_.toDouble).toArray
      assert(got(id) == model.project(x), s"row $id")
    }
  }

  test("deflation: second component recovers the second planted direction") {
    import spark.implicits._
    // points = t1 * u1 + t2 * u2 + noise with Var(t1) >> Var(t2):
    // pc1 -> u1, pc2 -> u2, and the two learned components are
    // near-orthogonal
    val dim = 8
    def unit(raw: Array[Double]) = {
      val n = math.sqrt(raw.map(x => x * x).sum); raw.map(_ / n)
    }
    val u1 = unit(Array.tabulate(dim)(j => math.sin(j + 1.0)))
    // Gram-Schmidt the second direction against the first
    val raw2 = Array.tabulate(dim)(j => math.cos(2.0 * j + 0.5))
    val d12 = raw2.zip(u1).map { case (a, b) => a * b }.sum
    val u2 = unit(raw2.zip(u1).map { case (a, b) => a - d12 * b })
    val rng = new scala.util.Random(11)
    val rows = (0 until 500).map { i =>
      val t1 = rng.nextGaussian() * 8
      val t2 = rng.nextGaussian() * 3
      (i.toLong, Seq.tabulate(dim)(j =>
        (t1 * u1(j) + t2 * u2(j) + rng.nextGaussian() * 0.05).toFloat))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val (_, comps) = Pca.fitK(spark, emb, "vec_id", "embedding", k = 2, iters = 30)
    def cos(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    assert(math.abs(cos(comps(0), u1)) > 0.99, comps(0).toSeq.toString)
    assert(math.abs(cos(comps(1), u2)) > 0.99, comps(1).toSeq.toString)
    assert(math.abs(cos(comps(0), comps(1))) < 0.02, "components not orthogonal")
  }

  test("fixed-point covariance: result is partitioning-invariant, bit for bit") {
    import spark.implicits._
    val rng = new scala.util.Random(23)
    val rows = (0 until 300).map(i =>
      (i.toLong, Seq.fill(6)((rng.nextGaussian()).toFloat)))
    val emb = rows.toDF("vec_id", "embedding")
    val a = Pca.project(spark, emb.repartition(1), "vec_id", "embedding", iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = Pca.project(spark, emb.repartition(7, col("vec_id")), "vec_id", "embedding", iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == b) // float sums would drift with arrival order; longs cannot
  }
}
