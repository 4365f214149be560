package graft.media

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.{ByteBuffer, ByteOrder}

/** Audio columns as REAL bytes: canonical RIFF/WAVE 16-bit PCM, encoded
  * and decoded with a from-scratch chunk-walking parser (WAV is pure
  * arithmetic — no codec library needed, so unlike video the audio path
  * carries no stub). Same posture as the ImageIO image path
  * (`Media.decodeBytes`): the decode stage trusts only the payload
  * bytes, fails closed on malformed input, and every decoded field is a
  * pure function of doc_id so a SQL oracle verifies the full binary
  * round-trip end-to-end.
  *
  * Features follow the training-pipeline shape: header metadata
  * (sample rate / channels / duration) for filtering, and fixed-window
  * integer energy + peak (the audio analog of frame sampling) for
  * silence trimming and loudness bucketing. Energy is an exact integer
  * sum of squares, so it is summation-order-immune by construction.
  */
object Wav {

  final case class AudioBlob(doc_id: Long, media_ref: String, content: Array[Byte])

  /** Deterministic per-doc audio parameters (the oracle replays these). */
  def rateOf(id: Long): Int = if (id % 2 == 0) 8000 else 16000
  def samplesOf(id: Long): Int = 1024 + (id % 3).toInt * 512
  def sampleAt(id: Long, i: Int): Short =
    ((id * 31L + i.toLong * 7919L) % 4096L - 2048L).toShort

  /** Canonical 44-byte-header mono 16-bit PCM WAV. */
  def encodeWav(id: Long): Array[Byte] = {
    val n = samplesOf(id)
    val rate = rateOf(id)
    val dataLen = n * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(rate)
      .putInt(rate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) { buf.putShort(sampleAt(id, i)); i += 1 }
    buf.array()
  }

  final case class WavMeta(
      sampleRate: Int, channels: Int, bits: Int, nSamples: Int,
      durationMs: Long, dataOffset: Int, ok: Boolean)

  private val Bad = WavMeta(-1, -1, -1, -1, -1L, -1, ok = false)

  /** Chunk-walking RIFF parse from the bytes alone — tolerates extra
    * chunks before `fmt `/`data` (real-world WAVs carry LIST/INFO),
    * fails closed on anything malformed or non-PCM.
    */
  def decodeMeta(content: Array[Byte]): WavMeta = {
    if (content == null || content.length < 44) return Bad
    val buf = ByteBuffer.wrap(content).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(off: Int): String =
      new String(content, off, 4, "US-ASCII")
    if (fourcc(0) != "RIFF" || fourcc(8) != "WAVE") return Bad
    var pos = 12
    var rate = -1
    var channels = -1
    var bits = -1
    var dataOff = -1
    var dataLen = -1
    while (pos + 8 <= content.length && (rate < 0 || dataOff < 0)) {
      val id = fourcc(pos)
      val len = buf.getInt(pos + 4)
      if (len < 0 || pos + 8 + len > content.length) return Bad
      if (id == "fmt ") {
        if (len < 16) return Bad
        val audioFormat = buf.getShort(pos + 8)
        if (audioFormat != 1) return Bad // PCM only
        channels = buf.getShort(pos + 10)
        rate = buf.getInt(pos + 12)
        bits = buf.getShort(pos + 22)
        if (channels < 1 || rate <= 0 || bits != 16) return Bad
      } else if (id == "data") {
        dataOff = pos + 8
        dataLen = len
      }
      pos += 8 + len + (len & 1) // RIFF chunks are word-aligned
    }
    if (rate < 0 || dataOff < 0) return Bad
    val frameBytes = channels * 2
    val n = dataLen / frameBytes
    WavMeta(rate, channels, bits, n, n.toLong * 1000L / rate, dataOff, ok = true)
  }

  /** One WAV blob per documents row (real bytes, CPU-bound synth gets
    * the same split spreading as the image codec).
    */
  def synthesize(spark: SparkSession, sfDir: String): Dataset[AudioBlob] = {
    import spark.implicits._
    graft.Parallelize.bySplits(
      spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id").cast("long").as("doc_id")), "doc_id")
      .as[Long]
      .map(id => AudioBlob(id, s"audio://$id/0", encodeWav(id)))
  }

  /** Typed decode stage: header metadata from the payload bytes. */
  def decode(blobs: Dataset[AudioBlob]): DataFrame = {
    import blobs.sparkSession.implicits._
    blobs.map { b =>
      val m = decodeMeta(b.content)
      (b.doc_id, m.sampleRate, m.channels, m.bits, m.nSamples.toLong,
        m.durationMs, m.ok)
    }.toDF("doc_id", "sample_rate", "channels", "bits", "n_samples",
      "duration_ms", "decode_ok")
  }

  /** Fixed-window integer features over the PCM payload: per window of
    * `window` mono samples (tail partial window included), the exact
    * sum of squared samples and the peak absolute amplitude. Rows fan
    * out record-locally — zero shuffles.
    */
  def windowEnergy(blobs: Dataset[AudioBlob], window: Int): DataFrame = {
    require(window > 0, s"bad window $window")
    import blobs.sparkSession.implicits._
    blobs.flatMap { b =>
      val m = decodeMeta(b.content)
      if (!m.ok || m.channels != 1) Iterator.empty
      else {
        val buf = ByteBuffer.wrap(b.content).order(ByteOrder.LITTLE_ENDIAN)
        (0 until (m.nSamples + window - 1) / window).iterator.map { wi =>
          var energy = 0L
          var peak = 0
          var i = wi * window
          val end = math.min(i + window, m.nSamples)
          while (i < end) {
            val s = buf.getShort(m.dataOffset + 2 * i).toInt
            energy += s.toLong * s
            val a = math.abs(s)
            if (a > peak) peak = a
            i += 1
          }
          (b.doc_id, wi, energy, peak)
        }
      }
    }.toDF("doc_id", "win_idx", "energy", "peak")
  }
}
