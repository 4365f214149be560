package graft.media

import java.nio.ByteBuffer
import java.security.MessageDigest

/** Minimal REAL ISO BMFF (MP4) container codec — the video analog of
  * the real PNG/JPEG (ImageIO) and RIFF/WAV codecs: the container
  * STRUCTURE is genuine `ftyp`/`moov` box grammar that any standards
  * demuxer walks, and the metadata the engine reports (width, height,
  * frame count) is parsed from real boxes — `tkhd`'s 16.16 fixed-point
  * track dimensions and `stts`'s sample table — never from a private
  * header. Only the SAMPLE DATA stays a stub: `mdat` carries
  * sha256-derived placeholder bytes because no video codec exists in
  * this container image; a real decoder would change only how `mdat`'s
  * samples are interpreted, not this box layer.
  *
  * Layout written by [[encode]] (all sizes fixed, so blob size is the
  * SQL-expressible contract `HeaderBytes + min(1024, w*h/64)`):
  *
  *   ftyp(24: isom, iso2)
  *   moov(329)
  *     mvhd(108: timescale 1000, duration frames*40ms)
  *     trak(213)
  *       tkhd(92: track 1, width/height as 16.16 fixed)
  *       mdia(113)
  *         mdhd(32: timescale 1000, duration, lang und)
  *         hdlr(33: 'vide')
  *         minf(40) > stbl(32) > stts(24: 1 entry, frames x 40ms)
  *   mdat(8 + payload)
  *
  * [[parse]] is a bounds-checked box walk (not offset peeking): it
  * requires a leading `ftyp`, descends `moov > trak > tkhd` for the
  * dimensions and `moov > trak > mdia > minf > stbl > stts` for the
  * frame count (summing sample_count over all entries), and fails
  * closed — any truncated/misdeclared box size returns None rather
  * than throwing, because one bad blob must not kill a 1000-executor
  * job.
  */
object Mp4 {

  /** Fixed byte cost of everything except mdat's payload. */
  val HeaderBytes: Int = 24 + 329 + 8

  val Timescale: Int = 1000
  val FrameMs: Int = 40 // 25 fps

  def isMp4(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 &&
      b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

  /** Deterministic single-track container: real box structure, stub
    * mdat payload of min(1024, w*h/64) sha256(doc_id)-derived bytes.
    */
  def encode(docId: Long, w: Int, h: Int, frames: Int): Array[Byte] = {
    val payloadLen = math.min(1024, (w * h) / 64)
    val buf = ByteBuffer.allocate(HeaderBytes + payloadLen)
    val duration = frames * FrameMs

    def box(size: Int, tpe: String): Unit = {
      buf.putInt(size)
      buf.put(tpe.getBytes("US-ASCII"))
    }
    def fullBox(size: Int, tpe: String): Unit = {
      box(size, tpe)
      buf.putInt(0) // version 0, flags 0
    }
    def identityMatrix(): Unit = {
      buf.putInt(0x00010000).putInt(0).putInt(0)
      buf.putInt(0).putInt(0x00010000).putInt(0)
      buf.putInt(0).putInt(0).putInt(0x40000000)
    }

    box(24, "ftyp")
    buf.put("isom".getBytes("US-ASCII")).putInt(0x200)
    buf.put("isom".getBytes("US-ASCII")).put("iso2".getBytes("US-ASCII"))

    box(329, "moov")
    fullBox(108, "mvhd")
    buf.putInt(0).putInt(0) // creation, modification
    buf.putInt(Timescale).putInt(duration)
    buf.putInt(0x00010000) // rate 1.0
    buf.putShort(0x0100.toShort).putShort(0) // volume 1.0, reserved
    buf.putLong(0L) // reserved
    identityMatrix()
    var i = 0
    while (i < 6) { buf.putInt(0); i += 1 } // pre_defined[6]
    buf.putInt(2) // next_track_ID

    box(213, "trak")
    fullBox(92, "tkhd")
    buf.putInt(0).putInt(0) // creation, modification
    buf.putInt(1).putInt(0) // track_ID, reserved
    buf.putInt(duration)
    buf.putLong(0L) // reserved
    buf.putShort(0).putShort(0).putShort(0).putShort(0) // layer/alt/volume/resv
    identityMatrix()
    buf.putInt(w << 16).putInt(h << 16) // 16.16 fixed

    box(113, "mdia")
    fullBox(32, "mdhd")
    buf.putInt(0).putInt(0)
    buf.putInt(Timescale).putInt(duration)
    buf.putShort(0x55C4.toShort).putShort(0) // language 'und', pre_defined

    fullBox(33, "hdlr")
    buf.putInt(0) // pre_defined
    buf.put("vide".getBytes("US-ASCII"))
    buf.putInt(0).putInt(0).putInt(0) // reserved[3]
    buf.put(0.toByte) // empty NUL-terminated name

    box(40, "minf")
    box(32, "stbl")
    fullBox(24, "stts")
    buf.putInt(1) // entry_count
    buf.putInt(frames).putInt(FrameMs) // sample_count, sample_delta

    box(8 + payloadLen, "mdat")
    val digest = MessageDigest.getInstance("SHA-256")
      .digest(docId.toString.getBytes("US-ASCII"))
    i = 0
    while (i < payloadLen) { buf.put(digest(i % digest.length)); i += 1 }
    buf.array()
  }

  /** (width, height, n_frames) parsed from the box tree; None on any
    * structural violation (missing ftyp/moov/trak/tkhd/stts, truncated
    * or misdeclared box sizes).
    */
  def parse(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (!isMp4(b)) return None
    // child box scan of [from, until): returns (payloadFrom, payloadUntil)
    // of the first box with the wanted type, walking declared sizes with
    // bounds checks
    def find(from: Int, until: Int, tpe: String): Option[(Int, Int)] = {
      var p = from
      while (p + 8 <= until) {
        val size = ByteBuffer.wrap(b, p, 4).getInt
        if (size < 8 || p + size > until) return None
        val t = new String(b, p + 4, 4, "US-ASCII")
        if (t == tpe) return Some((p + 8, p + size))
        p += size
      }
      None
    }
    try {
      for {
        (moovFrom, moovUntil) <- find(0, b.length, "moov")
        (trakFrom, trakUntil) <- find(moovFrom, moovUntil, "trak")
        (tkhdFrom, tkhdUntil) <- find(trakFrom, trakUntil, "tkhd")
        if tkhdUntil - tkhdFrom >= 84
        (mdiaFrom, mdiaUntil) <- find(trakFrom, trakUntil, "mdia")
        (minfFrom, minfUntil) <- find(mdiaFrom, mdiaUntil, "minf")
        (stblFrom, stblUntil) <- find(minfFrom, minfUntil, "stbl")
        (sttsFrom, sttsUntil) <- find(stblFrom, stblUntil, "stts")
        if sttsUntil - sttsFrom >= 8
      } yield {
        // tkhd v0 payload: verflags(4) times(8) track(4) resv(4)
        // duration(4) resv(8) layer/alt/volume/resv(8) matrix(36) = 76,
        // then width and height as 16.16 fixed
        val dims = ByteBuffer.wrap(b, tkhdFrom + 76, 8)
        val w = dims.getInt >>> 16
        val h = dims.getInt >>> 16
        val st = ByteBuffer.wrap(b, sttsFrom + 4, sttsUntil - sttsFrom - 4)
        val entries = st.getInt
        var frames = 0
        var e = 0
        while (e < entries && st.remaining() >= 8) {
          frames += st.getInt
          st.getInt // sample_delta
          e += 1
        }
        (w, h, frames)
      }
    } catch {
      case _: IndexOutOfBoundsException | _: IllegalArgumentException => None
    }
  }
}
