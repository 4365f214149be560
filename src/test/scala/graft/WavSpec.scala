package graft

import graft.media.Wav
import org.scalatest.funsuite.AnyFunSuite

import java.nio.{ByteBuffer, ByteOrder}

/** The RIFF/PCM WAV codec: encode->parse round-trip, chunk-walk
  * robustness (extra chunks, truncation, non-PCM, odd-length padding),
  * and the windowed-energy arithmetic against a direct recompute.
  */
class WavSpec extends AnyFunSuite {

  test("encode->decodeMeta round-trips the generator parameters") {
    for (id <- Seq(0L, 1L, 2L, 3L, 17L, 1000L)) {
      val m = Wav.decodeMeta(Wav.encodeWav(id))
      assert(m.ok)
      assert(m.sampleRate == Wav.rateOf(id))
      assert(m.channels == 1 && m.bits == 16)
      assert(m.nSamples == Wav.samplesOf(id))
      assert(m.durationMs == m.nSamples.toLong * 1000L / m.sampleRate)
    }
  }

  test("decoded samples match the formula") {
    val id = 42L
    val bytes = Wav.encodeWav(id)
    val m = Wav.decodeMeta(bytes)
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    for (i <- 0 until m.nSamples)
      assert(buf.getShort(m.dataOffset + 2 * i) == Wav.sampleAt(id, i))
  }

  test("chunk walker tolerates an extra LIST chunk before fmt/data") {
    val base = Wav.encodeWav(7L)
    // splice LIST(len 5, odd -> 1 pad byte) between WAVE and fmt
    val extra = ByteBuffer.allocate(8 + 6).order(ByteOrder.LITTLE_ENDIAN)
    extra.put("LIST".getBytes("US-ASCII")).putInt(5)
      .put(Array[Byte]('I', 'N', 'F', 'O', 'x', 0))
    val spliced = ByteBuffer.allocate(base.length + 14).order(ByteOrder.LITTLE_ENDIAN)
    spliced.put(base, 0, 12).put(extra.array()).put(base, 12, base.length - 12)
    val m = Wav.decodeMeta(spliced.array())
    assert(m.ok && m.sampleRate == Wav.rateOf(7L) && m.nSamples == Wav.samplesOf(7L))
  }

  test("fails closed: truncated, bad magic, non-PCM, chunk past end") {
    val good = Wav.encodeWav(3L)
    assert(!Wav.decodeMeta(null).ok)
    assert(!Wav.decodeMeta(good.take(30)).ok)
    assert(!Wav.decodeMeta(good.take(100)).ok) // data chunk overruns
    val badMagic = good.clone(); badMagic(0) = 'X'
    assert(!Wav.decodeMeta(badMagic).ok)
    val nonPcm = good.clone(); nonPcm(20) = 3 // audioFormat = IEEE float
    assert(!Wav.decodeMeta(nonPcm).ok)
  }

  test("windowEnergy matches a direct recompute including the tail window") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").appName("graft-wav-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    val ids = Seq(0L, 1L, 2L, 5L)
    val blobs = ids.map(id => Wav.AudioBlob(id, s"audio://$id/0", Wav.encodeWav(id))).toDS()
    // window 300 does NOT divide 1024/1536/2048 -> real tail windows
    val got = Wav.windowEnergy(blobs, window = 300)
      .as[(Long, Int, Long, Int)].collect().toSet
    val want = ids.flatMap { id =>
      val n = Wav.samplesOf(id)
      (0 until (n + 299) / 300).map { wi =>
        val s = (wi * 300 until math.min(wi * 300 + 300, n)).map(Wav.sampleAt(id, _).toLong)
        (id, wi, s.map(v => v * v).sum, s.map(math.abs).max.toInt)
      }
    }.toSet
    assert(got == want)
  }
}
