package graft

import graft.media.{Media, Phash}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** dHash perceptual image near-dup:
  *  1. the decoded-pixel hash equals an independent replay of the
  *     synthesis formula (PNG round-trip is lossless, luma/grid math
  *     agrees bit for bit);
  *  2. a uniform +16 brightness shift is hash-invariant;
  *  3. a left-stripe overlay only ever touches chunk 0;
  *  4. nearDups finds the planted pairs with brute-force-exact Hamming
  *     and excludes unrelated images;
  *  5. the bucket cap drops over-cap buckets whole.
  */
class PhashSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-phash-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Formula-only replay of dhashChunks for variant v — no ImageIO. */
  private def expectedChunks(key: Long, v: Int, w: Int, h: Int): Array[Int] = {
    val kk = if (v == 3) key * 1000003L + 999999937L else key
    def luma(x: Int, y: Int): Int = {
      if (v == 2 && x < w / 9) 127
      else {
        val raw = kk * 1315423911L + x * 2654435761L + y * 97531L
        val r = ((raw >> 16) & 0x7F).toInt
        val g = ((raw >> 8) & 0x7F).toInt
        val b = (raw & 0x7F).toInt
        (299 * r + 587 * g + 114 * b) / 1000 + (if (v == 1) 16 else 0)
      }
    }
    val chunks = new Array[Int](4)
    for (i <- 0 until 8; j <- 0 until 8)
      if (luma((i + 1) * w / 9, j * h / 8) > luma(i * w / 9, j * h / 8))
        chunks(i / 2) |= 1 << ((i % 2) * 8 + j)
    chunks
  }

  private def ham(a: Array[Int], b: Array[Int]): Int =
    a.zip(b).map { case (x, y) => Integer.bitCount(x ^ y) }.sum

  test("decoded-pixel dHash equals the formula replay for every variant") {
    for (key <- Seq(0L, 7L, 123L); v <- 0 to 3) {
      val w = Media.widthOf(key); val h = Media.heightOf(key)
      val got = Phash.dhashChunks(Phash.encodeKeyedPng(key, v, w, h))
      assert(got.toSeq == expectedChunks(key, v, w, h).toSeq,
        s"key=$key v=$v")
    }
  }

  test("uniform brightness shift (variant 1) is dHash-invariant") {
    for (key <- 0L until 20L) {
      val w = Media.widthOf(key); val h = Media.heightOf(key)
      assert(Phash.dhashChunks(Phash.encodeKeyedPng(key, 0, w, h)).toSeq ==
        Phash.dhashChunks(Phash.encodeKeyedPng(key, 1, w, h)).toSeq)
    }
  }

  test("left-stripe overlay (variant 2) only ever changes chunk 0") {
    for (key <- 0L until 20L) {
      val w = Media.widthOf(key); val h = Media.heightOf(key)
      val base = Phash.dhashChunks(Phash.encodeKeyedPng(key, 0, w, h))
      val edit = Phash.dhashChunks(Phash.encodeKeyedPng(key, 2, w, h))
      assert(base(1) == edit(1) && base(2) == edit(2) && base(3) == edit(3))
      assert(ham(base, edit) <= 8)
    }
  }

  test("nearDups finds planted pairs with exact Hamming, excludes unrelated") {
    import spark.implicits._
    val n = 40 // 10 groups of 4
    val blobs = (0L until n).map { id =>
      val k = id / 4; val v = (id % 4).toInt
      val w = Media.widthOf(k); val h = Media.heightOf(k)
      Media.MediaBlob(id, s"phash://$id", "png", w, h, 1,
        Phash.encodeKeyedPng(k, v, w, h))
    }.toDS()
    val got = Phash.nearDups(blobs, maxDist = 8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap

    // brute-force ground truth over the same banding + rerank semantics
    val chunks = (0L until n).map { id =>
      id -> expectedChunks(id / 4, (id % 4).toInt,
        Media.widthOf(id / 4), Media.heightOf(id / 4))
    }.toMap
    val want = (for {
      a <- 0L until n; b <- (a + 1) until n
      if (0 until 4).exists(c => chunks(a)(c) == chunks(b)(c))
      d = ham(chunks(a), chunks(b))
      if d <= 8
    } yield (a, b) -> d).toMap
    assert(got == want)
    // the planted structure is actually exercised
    val g0 = got.filter(_._2 == 0)
    assert(g0.keySet.exists { case (a, b) => a / 4 == b / 4 && a % 4 == 0 && b % 4 == 1 })
    // every group's exact-dup pair (variants 0,1) survives at Hamming 0
    assert((0L until n / 4).forall(k => g0.contains((k * 4, k * 4 + 1))))
    // unrelated images (variant 3) drop out of MOST groups — the linear
    // pixel formula is structured enough that a rare chance chunk
    // collision with Hamming <= 8 is legitimate (and deterministic)
    assert(got.keySet.count { case (a, b) => b % 4 == 3 && a / 4 == b / 4 } <
      (n / 4).toInt)
  }

  test("over-cap buckets are dropped whole") {
    import spark.implicits._
    val blobs = (0L until 8L).map { id =>
      val k = id / 4; val v = (id % 4).toInt
      val w = Media.widthOf(k); val h = Media.heightOf(k)
      Media.MediaBlob(id, s"phash://$id", "png", w, h, 1,
        Phash.encodeKeyedPng(k, v, w, h))
    }.toDS()
    // cap=1: every shared bucket is over cap, so no candidates survive
    assert(Phash.nearDups(blobs, maxDist = 8, maxBucketSize = 1).count() == 0)
  }
}
