package graft

import graft.dedup.{Dedup, Incremental}
import graft.operators.{Cms, Hll}
import graft.textops.NaiveBayes
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-4c operators: HyperLogLog, count-min sketch, Naive Bayes
  * classification, LSH estimator calibration, incremental dedup.
  */
class SketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-sketch-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def valuesDf(grp: String, vals: Seq[String]): DataFrame = {
    import spark.implicits._
    vals.map(v => (grp, v)).toDF("grp", "v")
  }

  test("hll: estimate within expected error on a large distinct set") {
    val n = 5000
    val df = valuesDf("g", (0 until n).map(i => s"value_$i"))
    val got = Hll.distinctPerGroup(df, "grp", "v").collect()
    assert(got.length == 1)
    val est = got(0).getAs[Double]("est_distinct")
    // m=64 -> ~13% standard error; allow 4 sigma
    assert(math.abs(est - n) / n < 0.52, s"est=$est for true $n")
    assert(got(0).getAs[Long]("v_zero") == 0L)
  }

  test("hll: duplicate input does not change the estimate (set semantics)") {
    val vals = (0 until 1000).map(i => s"v$i")
    val once = Hll.distinctPerGroup(valuesDf("g", vals), "grp", "v").collect()(0)
    val thrice = Hll.distinctPerGroup(valuesDf("g", vals ++ vals ++ vals), "grp", "v")
      .collect()(0)
    assert(once.getAs[Double]("est_distinct") == thrice.getAs[Double]("est_distinct"))
    assert(once.getAs[Long]("z_scaled") == thrice.getAs[Long]("z_scaled"))
  }

  test("hll: merging split-half register files equals the whole-set sketch") {
    val vals = (0 until 2000).map(i => s"item$i")
    val (left, right) = vals.splitAt(1000)
    val whole = Hll.estimateFromRegisters(
      Hll.registers(valuesDf("g", vals), "grp", "v")).collect()(0)
    val merged = Hll.estimateFromRegisters(
      Hll.registers(valuesDf("g", left), "grp", "v")
        .union(Hll.registers(valuesDf("g", right), "grp", "v"))
        .groupBy(col("grp"), col("bucket"))
        .agg(max(col("mj")).as("mj"))).collect()(0)
    assert(whole.getAs[Long]("z_scaled") == merged.getAs[Long]("z_scaled"))
    assert(whole.getAs[Double]("est_distinct") == merged.getAs[Double]("est_distinct"))
  }

  test("hll: small sets fall to the linear-counting branch and stay accurate") {
    val n = 10
    val got = Hll.distinctPerGroup(
      valuesDf("g", (0 until n).map(i => s"rare$i")), "grp", "v").collect()(0)
    val v = got.getAs[Long]("v_zero")
    assert(v > 0)
    assert(got.getAs[Double]("est_distinct") == 64.0 * math.log(64.0 / v))
    assert(math.abs(got.getAs[Double]("est_distinct") - n) < 3.0)
  }

  test("cms: estimates never undercount and every true heavy hitter surfaces") {
    import spark.implicits._
    // skewed counts: value i appears i+1 times
    val rows = (0 until 300).flatMap(i => Seq.fill(i + 1)(s"tok$i")).toDF("v")
    val hh = Cms.heavyHitters(rows, "v", d = 4, w = 256, minCount = 1L)
    val got = hh.collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Long]("overestimate") >= 0L,
        s"CMS undercounted ${r.getAs[String]("v")}")
      assert(r.getAs[Long]("est_count") >=  r.getAs[Long]("exact_count"))
    }
    // no false negatives at threshold 200: values 199..299 have exact >= 200
    val reported = Cms.heavyHitters(rows, "v", d = 4, w = 256, minCount = 200L)
      .collect().map(_.getAs[String]("v")).toSet
    (199 until 300).foreach(i => assert(reported.contains(s"tok$i")))
  }

  test("cms: cell table size is bounded by d*w regardless of input") {
    import spark.implicits._
    val rows = (0 until 5000).map(i => s"u$i").toDF("v")
    assert(Cms.cells(rows, "v", d = 4, w = 64).count() <= 4L * 64)
  }

  test("naive bayes: separable classes classify perfectly on holdout") {
    import spark.implicits._
    // two classes with disjoint vocabularies; enough docs that both
    // sides of the 80/20 hash split are populated
    val docs = (0 until 60).map { i =>
      if (i % 2 == 0) (i.toLong, "sport", "goal match team player score win league")
      else (i.toLong, "cooking", "recipe oven flour butter bake sugar knead")
    }.toDF("doc_id", "label", "text")
    val got = NaiveBayes.classifyHoldout(docs, "doc_id", "label", "text").collect()
    assert(got.nonEmpty)
    got.foreach(r => assert(r.getAs[Boolean]("correct"),
      s"doc ${r.getAs[Long]("doc_id")} predicted ${r.getAs[String]("pred_label")}"))
    // holdout is the ~20% split, never the whole corpus
    assert(got.length < 30 && got.length > 2)
  }

  test("naive bayes: prediction is the argmax with label-ascending tie-break") {
    import spark.implicits._
    // identical class-conditional distributions -> scores tie except
    // priors; equal priors -> full tie -> smallest label wins
    val docs = (0 until 40).map { i =>
      (i.toLong, if (i % 2 == 0) "aaa" else "bbb", "same words every time")
    }.toDF("doc_id", "label", "text")
    val got = NaiveBayes.classifyHoldout(docs, "doc_id", "label", "text").collect()
    // both classes have 16 train docs (hash split is balanced here) or
    // close; at exact tie the predicted label must be the ascending min
    val scores = got.map(_.getAs[Long]("score_micro")).toSet
    if (scores.size == 1) got.foreach(r =>
      assert(r.getAs[String]("pred_label") == "aaa"))
  }

  test("estimator eval: err = est - exact, and exact matches ngramJaccardPairs") {
    import spark.implicits._
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val docs = Seq(
      (1L, base), (2L, base + " kilo"), (3L, base + " lima mike"),
      (4L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val eval = Dedup.estimatorEval(docs, "doc_id", "text", n = 3, k = 64, bands = 16)
      .collect()
    assert(eval.nonEmpty)
    eval.foreach { r =>
      assert(r.getAs[Double]("err") ==
        r.getAs[Double]("est_jaccard") - r.getAs[Double]("exact_jaccard"))
      assert(r.getAs[Double]("est_jaccard") ==
        r.getAs[Long]("n_match").toDouble / 64)
    }
    val exactPairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.0)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Double]("jaccard")).toMap
    eval.filter(_.getAs[Long]("n_common") > 0).foreach { r =>
      val k = (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))
      assert(exactPairs(k) == r.getAs[Double]("exact_jaccard"))
    }
  }

  test("incremental dedup: index partners win, batch dups point backwards") {
    import spark.implicits._
    val a = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val b = "uno dos tres cuatro cinco seis siete ocho nueve diez"
    // ids 1,2 index; 11,12,13 batch (explicit membership column)
    val docs = Seq(
      (1L, a), (2L, b),
      (11L, a + " kilo"), // dup of index doc 1
      (12L, b + " once"), // dup of index doc 2
      (13L, b + " once")) // dup of 12 (earlier batch) AND of 2 (index, smaller id)
      .toDF("doc_id", "text")
    val got = Incremental.dedupBatchAgainstIndex(
        docs, "doc_id", "text", isNew = col("doc_id") >= 10L,
        n = 3, k = 64, bands = 16, threshold = 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("dup_of"), r.getAs[String]("dup_source"))).toMap
    assert(got(11L) == (1L, "index"))
    assert(got(12L) == (2L, "index"))
    // 13 matches both 2 (index) and 12 (batch); smallest partner id wins
    assert(got(13L) == (2L, "index"))
    assert(!got.contains(1L) && !got.contains(2L))
  }

  test("incremental dedup: a unique batch doc is not reported") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha bravo charlie delta echo foxtrot golf hotel"),
      (11L, "completely different words entirely unrelated content here now"))
      .toDF("doc_id", "text")
    val got = Incremental.dedupBatchAgainstIndex(
      docs, "doc_id", "text", isNew = col("doc_id") >= 10L)
    assert(got.count() == 0L)
  }

  test("hll sliding window equals a fresh sketch of each window's union") {
    import spark.implicits._
    def d(s: String) = java.sql.Date.valueOf(s)
    val rows = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L),
      (java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 2L),
      (java.sql.Timestamp.valueOf("2024-01-02 10:00:00"), 2L),
      (java.sql.Timestamp.valueOf("2024-01-02 12:00:00"), 3L),
      (java.sql.Timestamp.valueOf("2024-01-04 09:00:00"), 9L))
      .toDF("ts", "user_id")
    val got = Hll.slidingDistinct(rows, "ts", "user_id", windowDays = 3)
      .collect().map(r => r.getDate(0) -> r.getAs[Long]("z_scaled")).toMap
    // windows: 01-01 -> {1,2}; 01-02 -> {1,2,3}; 01-04 -> days 01-02..
    // 01-04 -> {2,3,9}; no 01-03 row (no events that day)
    assert(got.keySet == Set(d("2024-01-01"), d("2024-01-02"), d("2024-01-04")))
    def fresh(vals: Seq[Long]): Long =
      Hll.distinctPerGroup(vals.map(v => ("g", v)).toDF("grp", "v"), "grp", "v",
        salt = "hllw").collect()(0).getAs[Long]("z_scaled")
    assert(got(d("2024-01-01")) == fresh(Seq(1L, 2L)))
    assert(got(d("2024-01-02")) == fresh(Seq(1L, 2L, 3L)))
    assert(got(d("2024-01-04")) == fresh(Seq(2L, 3L, 9L)))
  }
}
