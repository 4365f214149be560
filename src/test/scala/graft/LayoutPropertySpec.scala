package graft

import graft.lineage.{Manifest, MergeUpsert}
import graft.operators.ZOrder
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Random-input invariants for the layout/lakehouse operators, each
  * checked against an independent local simulation.
  */
class LayoutPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-layout-prop-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("property: z-order layout preserves the exact row multiset") {
    import spark.implicits._
    for (seed <- 1 to 4) {
      val rng = new Random(seed * 7919L)
      val rows = (0 until 500)
        .map(_ => (rng.nextInt(100000).toLong, rng.nextInt(100000).toLong,
          rng.nextInt(5).toLong)) // deliberate duplicates in all columns
      val df = rows.toDF("x", "y", "v")
      val laid = ZOrder.layout(df, "x", "y", numPartitions = 1 + rng.nextInt(7))
      val got = laid.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got.sorted.toSeq == rows.sorted)
    }
  }

  test("property: manifest range pruning never skips a file holding a qualifying row") {
    import spark.implicits._
    for (seed <- 1 to 5) {
      val rng = new Random(seed * 15485863L)
      val rows = (0 until 400).map { i =>
        val v: Option[Long] = if (rng.nextInt(10) == 0) None
          else Some(rng.nextInt(1000).toLong)
        (i.toLong, v, s"c${rng.nextInt(4)}")
      }
      val df = rows.toDF("id", "num", "cat")
      val lo = rng.nextInt(500).toLong
      val hi = lo + rng.nextInt(300).toLong
      val pruned = Manifest.pruneForRange(
        Manifest.fileStats(df, "id", "num", "cat", numFiles = 8), lo, hi)
      val keptFiles = pruned.filter(col("kept") === 1)
        .collect().map(_.getAs[Long]("file")).toSet
      // independently bucket every qualifying row; its file must be kept
      val md = java.security.MessageDigest.getInstance("MD5")
      def bucket(id: Long): Long = {
        val hex = md.digest(s"manifest$id".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(15)
        java.lang.Long.parseLong(hex, 16) % 8
      }
      rows.foreach {
        case (id, Some(v), _) if v >= lo && v <= hi =>
          assert(keptFiles(bucket(id)), s"file of qualifying row $id pruned")
        case _ => ()
      }
      // and pruning does something: with a narrow range over 8 files,
      // at least the all-null degenerate cannot force keeping nothing
      assert(pruned.count() == pruned.select("file").distinct().count())
    }
  }

  test("property: merge equals the local map-based upsert model") {
    import spark.implicits._
    for (seed <- 1 to 5) {
      val rng = new Random(seed * 32452843L)
      val targetRows = (0 until 60)
        .map(i => (i.toLong, rng.nextInt(100).toLong))
      // unique source keys over a range overlapping the target's
      val srcKeys = rng.shuffle((0 until 90).map(_.toLong)).take(40)
      val sourceRows = srcKeys
        .map(k => (k, rng.nextInt(100).toLong, rng.nextInt(4) == 0))
      val got = MergeUpsert.merge(
          targetRows.toDF("id", "v"),
          sourceRows.toDF("id", "v", "_deleted"), "id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = sourceRows.foldLeft(targetRows.toMap) {
        case (acc, (k, v, del)) => if (del) acc - k else acc + (k -> v)
      }
      assert(got == want)
    }
  }

  test("property: sentence segmentation loses no characters except boundary spaces") {
    import spark.implicits._
    val words = Vector("alpha", "beta.", "gamma!", "d?", "e...", "f.g", "!", "x")
    for (seed <- 1 to 5) {
      val rng = new Random(seed * 104729L)
      val docs = (0 until 30).map { id =>
        (id.toLong, (0 until 1 + rng.nextInt(12))
          .map(_ => words(rng.nextInt(words.size))).mkString(" "))
      }
      val got = docs.toDF("id", "t")
        .select(col("id"), graft.textops.TextOps.sentences(col("t")).as("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      docs.foreach { case (id, t) =>
        // reconstruction: boundaries removed exactly one space each
        val parts = got(id)
        assert(parts.mkString(" ") == t, s"doc $id")
        // every boundary is a genuine terminal-punct + space cut
        parts.init.foreach(p =>
          assert(p.nonEmpty && "!?.".contains(p.last), s"doc $id part '$p'"))
      }
    }
  }
}
