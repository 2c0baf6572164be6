package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

/** Real image codec on JDK-only `javax.imageio` (PNG/JPEG/BMP/GIF — no
  * external dependencies, so it works in this container and on any
  * executor). This is the "one-function swap" the stub codec layer in
  * [[Multimodal]] promised: the mapPartitions plumbing is unchanged, only
  * the bytes→features kernel differs. Audio/video stay stubbed (no JDK
  * demuxer).
  *
  * Determinism note: PNG decode is bit-exact by spec (lossless), so
  * grid-luminance features are reproducible across JVMs; JPEG decode is
  * decoder-dependent — use JPEG features for similarity, not for
  * oracle-exact comparisons.
  */
object ImageCodec {

  /** Decoded-image summary: container dims, mean luminance over all pixels
    * (exact integer mean, floor semantics), grid-cell luminance features. */
  final case class ImageInfo(width: Int, height: Int, meanLuma: Int,
                             features: Array[Float])

  /** Encode a solid-color image as PNG (test/gate fixture generator —
    * deterministic bytes for a given (w, h, rgb) on any JVM up to PNG
    * encoder variation; the GATE never compares the bytes, only the
    * decode-side recovery of these parameters from actual pixels). */
  def encodePng(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      g.setColor(new java.awt.Color(rgb))
      g.fillRect(0, 0, w, h)
    } finally g.dispose()
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Encode a horizontal 256-step gray gradient PNG (non-uniform fixture
    * so feature tests exercise per-cell aggregation, not just constants). */
  def encodeGradientPng(w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var x = 0
    while (x < w) {
      val v = (x * 255) / math.max(1, w - 1)
      val rgb = (v << 16) | (v << 8) | v
      var y = 0
      while (y < h) { img.setRGB(x, y, rgb); y += 1 }
      x += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Decode any ImageIO-supported container; None for null/undecodable
    * bytes (a real pipeline routes those to a quarantine column, it never
    * throws mid-scan). */
  def decode(bytes: Array[Byte]): Option[BufferedImage] =
    if (bytes == null) None
    else
      try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
      catch { case _: java.io.IOException => None }

  /** Decode + analyze: real dims from the container, mean luminance as an
    * exact integer (floor(sum(r+g+b) / (3n))), and `grid`×`grid` cell
    * luminance means in [0,1] as the feature vector (row-major). Cell
    * assignment is pixel→cell index (y*grid/h, x*grid/w), so any dims ≥
    * grid give a full feature vector; smaller images leave empty cells at
    * 0 (counts clamped, never NaN). */
  def analyze(bytes: Array[Byte], grid: Int = 4): Option[ImageInfo] =
    decode(bytes).map { img =>
      val w = img.getWidth
      val h = img.getHeight
      val sums = new Array[Long](grid * grid)
      val counts = new Array[Long](grid * grid)
      var total = 0L
      var y = 0
      while (y < h) {
        val cy = math.min(grid - 1, y * grid / h)
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
          val c = cy * grid + math.min(grid - 1, x * grid / w)
          sums(c) += lum
          counts(c) += 1
          total += lum
          x += 1
        }
        y += 1
      }
      val feats = new Array[Float](grid * grid)
      var i = 0
      while (i < feats.length) {
        if (counts(i) > 0)
          feats(i) = (sums(i).toDouble / (3.0 * 255.0 * counts(i))).toFloat
        i += 1
      }
      val n = w.toLong * h
      ImageInfo(w, h, if (n == 0) 0 else (total / (3L * n)).toInt, feats)
    }

  /** The real bytes→features kernel for image content — drop-in for
    * [[Multimodal.decodeStub]] (same signature), falling back to the stub
    * for bytes ImageIO cannot decode. */
  def imageFeatures(bytes: Array[Byte]): Array[Float] =
    analyze(bytes).map(_.features).getOrElse(Multimodal.decodeStub(bytes))

  /** Nearest-neighbor resize to exactly (outW, outH), re-encoded as PNG.
    * Output pixel (x, y) = input pixel (x·w/outW, y·h/outH) with integer
    * floor — a hand-rolled sampling loop, NOT AffineTransformOp, so the
    * rule is deterministic by construction on every JVM and the resized
    * pixels are recoverable by generator arithmetic in an oracle (PNG
    * round-trip is lossless). None for null/undecodable input. */
  def resizeNearestPng(bytes: Array[Byte], outW: Int, outH: Int): Option[Array[Byte]] = {
    require(outW >= 1 && outH >= 1, s"resize dims must be >= 1, got ${outW}x$outH")
    decode(bytes).map { img =>
      val w = img.getWidth
      val h = img.getHeight
      val out = new BufferedImage(outW, outH, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < outH) {
        val sy = y * h / outH
        var x = 0
        while (x < outW) {
          out.setRGB(x, y, img.getRGB(x * w / outW, sy))
          x += 1
        }
        y += 1
      }
      val bos = new ByteArrayOutputStream()
      ImageIO.write(out, "png", bos)
      bos.toByteArray
    }
  }
}
