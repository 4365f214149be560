package graft.media

import java.awt.image.BufferedImage
import java.util.zip.{CRC32, Deflater, Inflater}

/** Minimal PNG codec for the synthetic-media hot path: 8-bit truecolor
  * (color type 2), non-interlaced, one IDAT, scanline filter 0 on
  * encode, all five standard filters accepted on decode.
  *
  * Why it exists: the media queries are CPU-bound on the codec, and
  * ImageIO's PNG writer runs its deflate at a high effort level with
  * per-pixel color-model conversions — measured several times the cost
  * of this writer (stored-block deflate over raw filter-0 scanlines —
  * the synthetic pixel pattern is near-incompressible noise, so deflate
  * effort buys nothing and nothing ships or hashes the container
  * bytes) for
  * byte streams that decode to BIT-IDENTICAL pixels. PNG is lossless,
  * so swapping the encoder cannot change anything downstream reads
  * from the pixels (dimensions, dHash samples, resize output) — only
  * the container bytes differ, and nothing hashes those. The decoder
  * exists for the same reason in reverse: inflate + defilter straight
  * into the INT_RGB raster, no ImageIO plugin dispatch, no
  * ColorModel.getRGB per pixel.
  *
  * Anything outside the profile (palette, alpha, 16-bit, interlace,
  * multi-IDAT reassembly beyond simple concatenation) returns null and
  * the caller falls back to ImageIO — the fail-closed posture of
  * Media.decodeBytes is unchanged.
  */
object FastPng {

  private val Magic = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')

  def isPng(b: Array[Byte]): Boolean =
    b != null && b.length >= 8 &&
      (0 until 8).forall(i => b(i) == Magic(i))

  /** Encode TYPE_INT_RGB as 8-bit truecolor PNG, filter 0, deflate
    * level 0 (stored). Any compliant decoder recovers the exact pixels.
    */
  def encode(img: BufferedImage): Array[Byte] = {
    val w = img.getWidth
    val h = img.getHeight
    val data = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferInt].getData
    // raw scanlines: 1 filter byte (0) + 3 bytes/pixel
    val raw = new Array[Byte](h * (1 + w * 3))
    var ri = 0
    var si = 0
    var y = 0
    while (y < h) {
      raw(ri) = 0
      ri += 1
      var x = 0
      while (x < w) {
        val p = data(si)
        raw(ri) = ((p >> 16) & 0xFF).toByte
        raw(ri + 1) = ((p >> 8) & 0xFF).toByte
        raw(ri + 2) = (p & 0xFF).toByte
        ri += 3
        si += 1
        x += 1
      }
      y += 1
    }
    val defl = new Deflater(0)
    defl.setInput(raw)
    defl.finish()
    val zbuf = new Array[Byte](raw.length + (raw.length >> 6) + 64)
    var zlen = 0
    while (!defl.finished()) {
      val n = defl.deflate(zbuf, zlen, zbuf.length - zlen)
      zlen += n
      if (zlen == zbuf.length && !defl.finished())
        return encodeGrow(w, h, raw) // pathological incompressible case
    }
    defl.end()
    assemble(w, h, zbuf, zlen)
  }

  private def encodeGrow(w: Int, h: Int, raw: Array[Byte]): Array[Byte] = {
    val defl = new Deflater(0)
    defl.setInput(raw)
    defl.finish()
    val out = new java.io.ByteArrayOutputStream(raw.length + 1024)
    val buf = new Array[Byte](64 * 1024)
    while (!defl.finished()) out.write(buf, 0, defl.deflate(buf))
    defl.end()
    val z = out.toByteArray
    assemble(w, h, z, z.length)
  }

  private def assemble(w: Int, h: Int, z: Array[Byte], zlen: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(zlen + 64)
    out.write(Magic, 0, 8)
    val ihdr = new Array[Byte](13)
    writeInt(ihdr, 0, w)
    writeInt(ihdr, 4, h)
    ihdr(8) = 8 // bit depth
    ihdr(9) = 2 // truecolor
    ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    chunk(out, "IHDR", ihdr, 13)
    chunk(out, "IDAT", z, zlen)
    chunk(out, "IEND", Array.emptyByteArray, 0)
    out.toByteArray
  }

  private def writeInt(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >>> 24).toByte
    b(off + 1) = (v >>> 16).toByte
    b(off + 2) = (v >>> 8).toByte
    b(off + 3) = v.toByte
  }

  private def chunk(out: java.io.ByteArrayOutputStream, tag: String,
      body: Array[Byte], len: Int): Unit = {
    val lb = new Array[Byte](4)
    writeInt(lb, 0, len)
    out.write(lb, 0, 4)
    val tb = tag.getBytes("US-ASCII")
    out.write(tb, 0, 4)
    out.write(body, 0, len)
    val crc = new CRC32()
    crc.update(tb, 0, 4)
    crc.update(body, 0, len)
    writeInt(lb, 0, crc.getValue.toInt)
    out.write(lb, 0, 4)
  }

  private def readInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
      ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)

  /** Decode an 8-bit truecolor non-interlaced PNG to TYPE_INT_RGB;
    * null when the payload is outside the profile or malformed (caller
    * falls back to ImageIO / fails closed).
    */
  def decode(b: Array[Byte]): BufferedImage = {
    try decodeOrThrow(b)
    catch { case _: Exception => null }
  }

  private def decodeOrThrow(b: Array[Byte]): BufferedImage = {
    if (!isPng(b)) return null
    var off = 8
    var w = -1
    var h = -1
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done && off + 8 <= b.length) {
      val len = readInt(b, off)
      if (len < 0 || off + 12 + len > b.length) return null
      val tag = new String(b, off + 4, 4, "US-ASCII")
      tag match {
        case "IHDR" =>
          if (len != 13) return null
          w = readInt(b, off + 8)
          h = readInt(b, off + 12)
          // bit depth 8, color 2 (RGB), deflate, filter method 0,
          // non-interlaced — anything else is out of profile
          if (b(off + 16) != 8 || b(off + 17) != 2 || b(off + 18) != 0 ||
            b(off + 19) != 0 || b(off + 20) != 0) return null
        case "IDAT" => idat.write(b, off + 8, len)
        case "IEND" => done = true
        case _ => () // ancillary chunks skipped
      }
      off += 12 + len
    }
    if (w <= 0 || h <= 0 || idat.size() == 0) return null
    if (w.toLong * h > 64L * 1024 * 1024) return null // sanity ceiling
    val stride = w * 3
    val raw = new Array[Byte](h * (1 + stride))
    val inf = new Inflater()
    inf.setInput(idat.toByteArray)
    var got = 0
    while (got < raw.length && !inf.finished()) {
      val n = inf.inflate(raw, got, raw.length - got)
      if (n == 0 && inf.needsInput()) return null // truncated
      got += n
    }
    inf.end()
    if (got != raw.length) return null
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val data = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferInt].getData
    // defilter in place row by row (bpp = 3)
    var y = 0
    var di = 0
    while (y < h) {
      val rowOff = y * (1 + stride) + 1
      val prevOff = rowOff - (1 + stride)
      val filter = raw(rowOff - 1) & 0xFF
      filter match {
        case 0 => ()
        case 1 => // Sub
          var i = 3
          while (i < stride) {
            raw(rowOff + i) = (raw(rowOff + i) + raw(rowOff + i - 3)).toByte
            i += 1
          }
        case 2 => // Up
          if (y > 0) {
            var i = 0
            while (i < stride) {
              raw(rowOff + i) = (raw(rowOff + i) + raw(prevOff + i)).toByte
              i += 1
            }
          }
        case 3 => // Average
          var i = 0
          while (i < stride) {
            val a = if (i >= 3) raw(rowOff + i - 3) & 0xFF else 0
            val u = if (y > 0) raw(prevOff + i) & 0xFF else 0
            raw(rowOff + i) = (raw(rowOff + i) + ((a + u) >> 1)).toByte
            i += 1
          }
        case 4 => // Paeth
          var i = 0
          while (i < stride) {
            val a = if (i >= 3) raw(rowOff + i - 3) & 0xFF else 0
            val u = if (y > 0) raw(prevOff + i) & 0xFF else 0
            val c = if (i >= 3 && y > 0) raw(prevOff + i - 3) & 0xFF else 0
            val p = a + u - c
            val pa = math.abs(p - a)
            val pb = math.abs(p - u)
            val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) u else c
            raw(rowOff + i) = (raw(rowOff + i) + pred).toByte
            i += 1
          }
        case _ => return null
      }
      var x = 0
      var i = rowOff
      while (x < w) {
        data(di) = ((raw(i) & 0xFF) << 16) | ((raw(i + 1) & 0xFF) << 8) |
          (raw(i + 2) & 0xFF)
        di += 1
        i += 3
        x += 1
      }
      y += 1
    }
    img
  }
}
