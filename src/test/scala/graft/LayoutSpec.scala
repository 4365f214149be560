package graft

import graft.lineage.Manifest
import graft.operators.ZOrder
import graft.textops.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Data-layout operators: z-order clustering, the column-stats
  * manifest + range pruning, and sentence segmentation.
  */
class LayoutSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-layout-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Independent bit-by-bit Morton reference. */
  private def morton(x: Long, y: Long): Long = {
    val cx = math.min(math.max(x, 0L), 65535L)
    val cy = math.min(math.max(y, 0L), 65535L)
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | (((cx >> i) & 1L) << (2 * i)) | (((cy >> i) & 1L) << (2 * i + 1))
    }
  }

  test("zkey16 matches the bit-by-bit Morton reference, incl. clamping") {
    import spark.implicits._
    val cases = Seq[(Long, Long)](
      (0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (65535L, 65535L),
      (12345L, 54321L), (65535L, 0L), (255L, 256L),
      (-5L, 3L), (70000L, 2L), (3L, 99999L))
    val got = cases.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zkey16(col("x"), col("y")).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    cases.foreach { case (x, y) =>
      assert(got((x, y)) == morton(x, y), s"($x, $y)")
    }
  }

  test("z-order layout prunes a 1-D range predicate; linear layout cannot") {
    import spark.implicits._
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
      .toDF("xd", "yd")
    val parts = 8
    // layout keyed on y alone: every partition spans the full x range
    val byY = grid.repartitionByRange(parts, col("yd"))
    // z-order on (x, y): each partition covers a compact Morton block
    val byZ = ZOrder.layout(grid, "xd", "yd", parts)
    def skippable(df: DataFrame): Long =
      ZOrder.partitionStats(df, "xd")
        .filter(col("max_dim") < 10 || col("min_dim") > 15)
        .count()
    assert(skippable(byY) == 0L)
    assert(skippable(byZ) >= 2L, "z-order layout should make partitions skippable")
    // the layout moves rows, never changes them
    assert(byZ.count() == 64L * 64L)
  }

  /** JVM-side replay of PortableHash.salted60(id, "manifest") % 16. */
  private def bucketOf(id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"manifest$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % 16
  }

  test("fileStats aggregates per logical file; null num values counted not ranked") {
    import spark.implicits._
    val rows = Seq[(Long, Option[Long], String)](
      (1L, Some(10L), "en"), (2L, Some(30L), "de"), (3L, None, "en"),
      (4L, Some(20L), "en"), (5L, Some(5L), "fr"))
    val df = rows.toDF("id", "num", "cat")
    val m = Manifest.fileStats(df, "id", "num", "cat", numFiles = 16)
      .collect().map(r => r.getAs[Long]("file") -> r).toMap
    // global invariants
    assert(m.values.map(_.getAs[Long]("n_rows")).sum == 5L)
    assert(m.values.map(_.getAs[Long]("n_nulls")).sum == 1L)
    // spot-check the file holding id=1 against the JVM hash replay
    val b1 = bucketOf(1L)
    assert(m.contains(b1))
    val expectedIds = rows.map(_._1).filter(bucketOf(_) == b1)
    assert(m(b1).getAs[Long]("min_id") == expectedIds.min)
    assert(m(b1).getAs[Long]("max_id") == expectedIds.max)
  }

  test("pruneForRange keeps overlapping files, skips disjoint, keeps null-stats") {
    import spark.implicits._
    val manifest = Seq(
      (0L, 3L, 0L, Some(10L), Some(50L), 1L, 3L, 2L),  // overlaps [40, 60]
      (1L, 2L, 0L, Some(70L), Some(90L), 4L, 5L, 1L),  // above -> skip
      (2L, 2L, 0L, Some(1L), Some(9L), 6L, 7L, 1L),    // below -> skip
      (3L, 1L, 1L, None, None, 8L, 8L, 1L))            // no stats -> keep
      .toDF("file", "n_rows", "n_nulls", "min_val", "max_val",
        "min_id", "max_id", "ndv_cat")
    val kept = Manifest.pruneForRange(manifest, 40L, 60L)
      .collect().map(r => r.getAs[Long]("file") -> r.getAs[Int]("kept")).toMap
    assert(kept == Map(0L -> 1, 1L -> 0, 2L -> 0, 3L -> 1))
  }

  test("sentence segmentation splits on terminal punctuation + space") {
    import spark.implicits._
    val got = Seq(
      (1L, "One. Two! Three? Four"),
      (2L, "no terminal punctuation at all"),
      (3L, "Wait... really?! Yes."),
      (4L, "trailing. "))
      .toDF("id", "t")
      .select(col("id"), TextOps.sentences(col("t")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) == Seq("One.", "Two!", "Three?", "Four"))
    assert(got(2L) == Seq("no terminal punctuation at all"))
    assert(got(3L) == Seq("Wait...", "really?!", "Yes."))
    // a terminal ". " boundary at end-of-text yields an empty tail —
    // deliberate: the oracle-side split behaves identically
    assert(got(4L) == Seq("trailing.", ""))
  }
}
