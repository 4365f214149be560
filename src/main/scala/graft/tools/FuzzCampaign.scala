package graft.tools

import graft._
import graft.extract.Extract
import graft.functions.GraftFunctions

import scala.util.Random

/** One-off deep-fuzz campaign (not part of the test gate): typed-path
  * vs expression-path equality over tens of thousands of random docs,
  * including corners beyond ExprSpec's fuzz — NaN/Infinity coordinate
  * payloads, duplicate and extreme offsets, unicode/long texts, giant
  * single runs — for all three strategies, plus a live check that
  * E2-edge == E2-midpoint on arbitrary (constraint-violating) inputs.
  * Prints divergent doc ids; exits nonzero on any.
  */
object FuzzCampaign {

  def randDoc(rng: Random, id: Int): Doc = {
    val nSpans = 1 + rng.nextInt(120)
    def coord(): String = rng.nextInt(12) match {
      case 0 => "NaN"
      case 1 => "Infinity"
      case 2 => "-Infinity"
      case 3 => f"${rng.nextDouble() * 1e12}%.1f"
      case 4 => f"${-rng.nextDouble()}%.6f"
      case _ => f"${rng.nextDouble() * 2 - 0.5}%.5f"
    }
    def text(k: Int): String = rng.nextInt(8) match {
      case 0 => ""
      case 1 => s" w$k "
      case 2 => s"w$k\t"
      case 3 => "émü-" + k + "-文字"
      case 4 => ("x" * (1 + rng.nextInt(300))) + k
      case _ => s"w$k"
    }
    def offset(k: Int): Int = rng.nextInt(10) match {
      case 0 => rng.nextInt(5) - 2          // duplicates/ties likely
      case 1 => Int.MaxValue - rng.nextInt(3)
      case 2 => Int.MinValue + rng.nextInt(3)
      case _ => k
    }
    val spans = (0 until nSpans).map { k =>
      rng.nextInt(8) match {
        case 0 => Span("text", text(k), "", offset(k))
        case 1 => Span("media", "", s"m$k", offset(k))
        case 2 | 3 | 4 =>
          Span("word_box", text(k), s"${coord()},${coord()},${coord()},${coord()}", offset(k))
        case 5 => Span("word_box", s"bad$k", if (rng.nextBoolean()) "not,a,box" else "", offset(k))
        case 6 => Span("cell", text(k), s"${1 + rng.nextInt(5)},${1 + rng.nextInt(5)}", offset(k))
        case 7 => Span("html", s"<p>p$k</p><a href=x>n$k</a>", "", offset(k))
      }
    }.toVector
    Doc(s"fz-$id", spans)
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("FUZZ_N", "20000").toInt
    val seed = sys.env.getOrElse("FUZZ_SEED", "7").toLong
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = {
      val rng = new Random(seed)
      (0 until n).map(randDoc(rng, _))
    }
    val ds = spark.createDataset(docs)

    def collect(df: org.apache.spark.sql.DataFrame): Map[String, String] =
      df.select($"doc_id", $"n_tables", $"n_cells", $"status",
          org.apache.spark.sql.functions.to_json($"spans").as("sp"))
        .collect()
        .map(r => r.getString(0) -> s"${r.get(1)}|${r.get(2)}|${r.getString(3)}|${r.getString(4)}")
        .toMap

    var bad = 0
    def compare(label: String, a: Map[String, String], b: Map[String, String]): Unit = {
      // bidirectional: a doc id present on only one side is a divergence
      val diff = (a.keySet ++ b.keySet)
        .filter(k => a.get(k) != b.get(k)).toSeq.sorted
      if (diff.nonEmpty) {
        bad += diff.size
        println(s"[fuzz] $label DIVERGES on ${diff.size} docs: ${diff.take(10).mkString(", ")}")
      } else println(s"[fuzz] $label: ${a.size} docs identical")
    }

    val typedE1 = collect(Extract.run(ds).toDF())
    val exprE1 = collect(GraftFunctions.extractDF(spark, ds.toDF()))
    compare("E1 typed==expr", typedE1, exprE1)
    val typedE2 = collect(Extract.run(ds, Extract.Strategy.SplitHeuristic).toDF())
    val exprE2 = collect(GraftFunctions.extractDF(spark, ds.toDF(), split = true))
    compare("E2 typed==expr", typedE2, exprE2)
    val typedE2m = collect(Extract.run(ds, Extract.Strategy.SplitMidpoint).toDF())
    val exprE2m = collect(GraftFunctions.extractDF(spark, ds.toDF(), split = true, midpoint = true))
    compare("E2mid typed==expr", typedE2m, exprE2m)
    // the pipeline-equivalence proof, live on wild inputs
    compare("E2 == E2mid (proof)", typedE2, typedE2m)

    spark.stop()
    if (bad > 0) sys.exit(1)
    println(s"[fuzz] campaign clean: $n docs x 3 strategies + proof check")
  }
}
