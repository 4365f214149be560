package graft.sinks

import graft.WordBox

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** Debug-image sink: draw 1px red bounding-box outlines onto an image
  * (the reference's visual sink, image/image.go:15-62). JDK-native
  * BufferedImage + ImageIO — no external image libraries.
  *
  * Pixel semantics match the reference's drawBox (image/image.go:42-62):
  * normalized coords scale by image width/height with int truncation,
  * inclusive line endpoints, out-of-bounds writes ignored (Go's
  * img.Set is a no-op outside bounds).
  */
object DebugImage {

  val Red = 0xFFFF0000

  def drawBoxes(img: BufferedImage, boxes: Seq[WordBox]): Unit = {
    val w = img.getWidth
    val h = img.getHeight
    def set(x: Int, y: Int): Unit =
      if (x >= 0 && x < w && y >= 0 && y < h) img.setRGB(x, y, Red)
    for (b <- boxes) {
      val x1 = (b.leftX * w).toInt
      val x2 = (b.rightX * w).toInt
      val y1 = (b.topY * h).toInt
      val y2 = (b.bottomY * h).toInt
      var x = x1
      while (x <= x2) { set(x, y1); set(x, y2); x += 1 }
      var y = y1
      while (y <= y2) { set(x1, y); set(x2, y); y += 1 }
    }
  }

  /** White canvas + box outlines, PNG-encoded. */
  def renderPng(boxes: Seq[WordBox], width: Int, height: Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_ARGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, 0xFFFFFFFF); x += 1 }
      y += 1
    }
    drawBoxes(img, boxes)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Overlay variant mirroring AddBoxes (image/image.go:15-39): decode an
    * existing PNG, draw outlines, re-encode.
    */
  def addBoxes(pngBytes: Array[Byte], boxes: Seq[WordBox]): Array[Byte] = {
    val src = ImageIO.read(new java.io.ByteArrayInputStream(pngBytes))
    val img = new BufferedImage(src.getWidth, src.getHeight, BufferedImage.TYPE_INT_ARGB)
    val g = img.createGraphics()
    g.drawImage(src, 0, 0, null)
    g.dispose()
    drawBoxes(img, boxes)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }
}
