package graft

import graft.extract.Extract
import graft.fixtures.SpanGen
import graft.functions.GraftFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native Catalyst expression must be indistinguishable from the
  * typed-Dataset reference implementation on every fixture, including
  * goldens, pass-through cases and the E2 strategy.
  */
class ExprSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-expr-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def collectPath(df: org.apache.spark.sql.DataFrame): Map[String, (Seq[Span], Int, Int, String)] = {
    import spark.implicits._
    df.select("doc_id", "spans", "n_tables", "n_cells", "status")
      .as[(String, Seq[Span], Int, Int, String)]
      .collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
  }

  test("expression path == typed path on 200 seeded fixture docs (E1)") {
    import spark.implicits._
    val fixtures = SpanGen.genDocs(200, seed = 77L)
    val ds = spark.createDataset(fixtures.map(_._1))
    val typed = collectPath(Extract.run(ds).toDF())
    val exprd = collectPath(GraftFunctions.extractDF(spark, ds.toDF()))
    assert(typed.keySet == exprd.keySet)
    for ((k, v) <- typed) assert(exprd(k) == v, s"doc $k")
    // and the goldens hold through the expression path too
    val goldens = fixtures.map { case (d, g) => d.doc_id -> g }.toMap
    for ((k, (spans, _, _, status)) <- exprd) {
      assert(status == "ok")
      assert(spans == goldens(k), s"golden $k")
    }
  }

  test("expression path == typed path with the E2 split heuristic") {
    import spark.implicits._
    val ds = spark.createDataset(SpanGen.genDocs(60, seed = 31L).map(_._1))
    val typed = collectPath(Extract.run(ds, Extract.Strategy.SplitHeuristic).toDF())
    val exprd = collectPath(GraftFunctions.extractDF(spark, ds.toDF(), split = true))
    for ((k, v) <- typed) assert(exprd(k) == v, s"doc $k")
  }

  test("expression path handles degenerate docs like the typed path") {
    import spark.implicits._
    val weird = Seq(
      Doc("empty", Nil),
      Doc("bad-box", Vector(Span("word_box", "w", "not-a-bbox", 0))),
      Doc("bad-cells", Vector(Span("cell", "a", "1,1", 0), Span("cell", "b", "3,1", 1))),
      Doc("shuffled", Vector(Span("text", "b", "", 1), Span("text", "a", "", 0))),
      Doc("neg-offsets", Vector(Span("text", "x", "", -5), Span("text", "y", "", -9))),
      Doc("html", Vector(Span("html", "<p>keep this</p><a href=x>drop</a>", "", 0))))
    val ds = spark.createDataset(weird)
    val typed = collectPath(Extract.run(ds).toDF())
    val exprd = collectPath(GraftFunctions.extractDF(spark, ds.toDF()))
    for ((k, v) <- typed) assert(exprd(k) == v, s"doc $k")
  }

  test("fuzz: expression == typed on adversarial (constraint-violating) geometry") {
    import spark.implicits._
    // random overlapping bands / chained x-overlaps / zero-area boxes /
    // negative coords — outside the fixture validity envelope on purpose
    val rng = new scala.util.Random(99)
    def randDoc(id: Int): Doc = {
      val nSpans = 1 + rng.nextInt(25)
      val spans = (0 until nSpans).map { k =>
        rng.nextInt(6) match {
          case 0 => Span("text", s"t$k", "", k)
          case 1 => Span("media", "", s"m$k", k)
          case 2 =>
            val x0 = rng.nextDouble() * 2 - 0.5
            val y0 = rng.nextDouble() * 2 - 0.5
            val w = rng.nextDouble() * 0.6
            val h = rng.nextDouble() * 0.6
            Span("word_box", s"w$k", f"$x0%.4f,${x0 + w}%.4f,$y0%.4f,${y0 + h}%.4f", k)
          case 3 => Span("word_box", s"bad$k", "not,a,box", k)
          case 4 => Span("cell", s"c$k", s"${1 + rng.nextInt(4)},${1 + rng.nextInt(4)}", k)
          case 5 => Span("html", s"<p>p$k</p>", "", k)
        }
      }
      Doc(s"fuzz-$id", spans)
    }
    val docs = (0 until 400).map(randDoc)
    val ds = spark.createDataset(docs)
    val typed = collectPath(Extract.run(ds).toDF())
    val exprd = collectPath(GraftFunctions.extractDF(spark, ds.toDF()))
    for ((k, v) <- typed) assert(exprd(k) == v, s"doc $k")
    // and E2 (the non-total-comparator path) too
    val typed2 = collectPath(Extract.run(ds, Extract.Strategy.SplitHeuristic).toDF())
    val exprd2 = collectPath(GraftFunctions.extractDF(spark, ds.toDF(), split = true))
    for ((k, v) <- typed2) assert(exprd2(k) == v, s"E2 doc $k")
  }

  test("extract_spans is callable from SQL") {
    import spark.implicits._
    GraftFunctions.register(spark)
    spark.createDataset(SpanGen.genDocs(3, 5L).map(_._1))
      .createOrReplaceTempView("docs_v")
    val got = spark.sql(
      "SELECT doc_id, extract_spans(spans).n_cells AS nc FROM docs_v")
      .collect()
    assert(got.length == 3)
    assert(got.forall(_.getAs[Int]("nc") > 0))
  }

  test("expression plan is a single Project over the scan (no object round-trip)") {
    import spark.implicits._
    val ds = spark.createDataset(SpanGen.genDocs(3, 6L).map(_._1))
    val plan = GraftFunctions.extractDF(spark, ds.toDF())
      .queryExecution.executedPlan.toString
    assert(!plan.contains("DeserializeToObject"), plan)
    assert(!plan.contains("MapPartitions"), plan)
  }
}
