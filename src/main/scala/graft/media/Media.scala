package graft.media

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.ByteBuffer
import java.security.MessageDigest

/** Multimodal columns: image/audio/video as opaque `binary` with typed
  * metadata. The Spark-side plumbing (schema, binary payloads, typed
  * mapPartitions over byte arrays, batch shape) is real and tested; the
  * codec itself is a clearly-marked deterministic STUB because no
  * image/audio libraries exist in this container — `decodeStub` parses
  * our own 17-byte header instead of running a real decoder. Swapping in
  * a real codec changes only the body of `decodeFrame`/`resizeBytes`.
  */
object Media {

  final case class MediaBlob(
      doc_id: Long,
      media_ref: String,
      format: String,
      width: Int,
      height: Int,
      n_frames: Int,
      content: Array[Byte])

  final case class FrameSample(doc_id: Long, frame_idx: Int, content: Array[Byte])

  val Magic: Array[Byte] = "GIMG".getBytes("US-ASCII")

  /** Deterministic fake payload: 17-byte header (magic, w, h, frames,
    * format byte) + sha256(doc_id)-derived bytes.
    */
  def encodeBytes(docId: Long, w: Int, h: Int, frames: Int, fmt: Byte): Array[Byte] = {
    val payloadLen = math.min(1024, (w * h) / 64)
    val buf = ByteBuffer.allocate(17 + payloadLen)
    buf.put(Magic).putInt(w).putInt(h).putInt(frames).put(fmt)
    val digest = MessageDigest.getInstance("SHA-256")
      .digest(docId.toString.getBytes("US-ASCII"))
    var i = 0
    while (i < payloadLen) { buf.put(digest(i % digest.length)); i += 1 }
    buf.array()
  }

  /** Metadata is a pure function of doc_id (so a SQL oracle can verify
    * the decoded output end-to-end through the binary round-trip).
    */
  def widthOf(id: Long): Int = 64 + (id % 7).toInt * 32
  def heightOf(id: Long): Int = 48 + (id % 5).toInt * 32
  def framesOf(id: Long): Int = 1 + (id % 10).toInt
  def formatOf(id: Long): String = (id % 3) match {
    case 0 => "png"; case 1 => "jpg"; case _ => "mp4"
  }
  private def formatByte(fmt: String): Byte = fmt match {
    case "png" => 0; case "jpg" => 1; case _ => 2
  }
  private def formatName(b: Byte): String = b match {
    case 0 => "png"; case 1 => "jpg"; case _ => "mp4"
  }

  /** One synthetic media blob per documents row. */
  def synthesize(spark: SparkSession, sfDir: String): Dataset[MediaBlob] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long"))
      .as[Long]
      .map { id =>
        val (w, h, f, fmt) = (widthOf(id), heightOf(id), framesOf(id), formatOf(id))
        MediaBlob(id, s"media://$id/0", fmt, w, h, f,
          encodeBytes(id, w, h, f, formatByte(fmt)))
      }
  }

  /** STUB decode: parse the header back out of the binary column. A real
    * implementation would hand `content` to an image/video library here.
    */
  def decodeStub(blobs: Dataset[MediaBlob]): DataFrame = {
    import blobs.sparkSession.implicits._
    blobs.map { b =>
      val ok = b.content.length >= 17 &&
        java.util.Arrays.equals(b.content.slice(0, 4), Magic)
      if (!ok) (b.doc_id, -1, -1, -1, "invalid", false)
      else {
        val buf = ByteBuffer.wrap(b.content, 4, 13)
        val w = buf.getInt; val h = buf.getInt; val f = buf.getInt
        (b.doc_id, w, h, f, formatName(buf.get()), true)
      }
    }.toDF("doc_id", "width", "height", "n_frames", "format", "decode_ok")
  }

  /** decodeStub plus the payload size — one pass, used to verify the
    * resize contract (metadata AND payload shape track the target dims).
    */
  def decodeWithSize(blobs: Dataset[MediaBlob]): DataFrame = {
    import blobs.sparkSession.implicits._
    blobs.map { b =>
      val ok = b.content.length >= 17 &&
        java.util.Arrays.equals(b.content.slice(0, 4), Magic)
      if (!ok) (b.doc_id, -1, -1, -1, "invalid", false, b.content.length)
      else {
        val buf = ByteBuffer.wrap(b.content, 4, 13)
        val w = buf.getInt; val h = buf.getInt; val f = buf.getInt
        (b.doc_id, w, h, f, formatName(buf.get()), true, b.content.length)
      }
    }.toDF("doc_id", "width", "height", "n_frames", "format", "decode_ok", "n_bytes")
  }

  /** STUB resize: rewrite the header with scaled dims, keep the payload
    * shape contract (payload size tracks w*h).
    */
  def resizeStub(blobs: Dataset[MediaBlob], targetW: Int, targetH: Int): Dataset[MediaBlob] = {
    import blobs.sparkSession.implicits._
    blobs.map { b =>
      MediaBlob(b.doc_id, b.media_ref, b.format, targetW, targetH, b.n_frames,
        encodeBytes(b.doc_id, targetW, targetH, b.n_frames, formatByte(b.format)))
    }
  }

  /** STUB frame sampling: every `stride`-th frame as its own blob (real
    * per-frame decode would replace the payload synthesis).
    */
  def frameSample(blobs: Dataset[MediaBlob], stride: Int): Dataset[FrameSample] = {
    import blobs.sparkSession.implicits._
    blobs.flatMap { b =>
      (0 until b.n_frames by stride).map { fi =>
        FrameSample(b.doc_id, fi,
          encodeBytes(b.doc_id * 131L + fi, b.width, b.height, 1, formatByte(b.format)))
      }
    }
  }
}
