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

  /** Encode a 32×32 PNG of 4-px gray blocks: block (bx, by)'s value is a
    * splitmix-style integer mix of (seed, bx, by) — pseudo-random PER SEED
    * (a linear formula would make adjacent-block comparisons, and hence
    * dHash, nearly seed-independent) — with block (pbx, pby) shifted +128
    * (mod 256). The near-duplicate fixture family for perceptual hashing:
    * same seed + different perturbed block ⇒ a few dHash bits apart;
    * different seeds ⇒ ~half the bits. All-integer generator arithmetic,
    * so an oracle or spec re-derives the sampled pixels exactly. */
  def blockValue(seed: Long, bx: Int, by: Int): Int = {
    var z = seed * 2654435761L + bx * 97L + by * 1013L
    z ^= z >>> 33
    z *= 0xff51afd7ed558ccdL
    z ^= z >>> 29
    (z & 0xff).toInt
  }

  def encodeBlocksPng(seed: Long, pbx: Int, pby: Int): Array[Byte] = {
    val img = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
    var by = 0
    while (by < 8) {
      var bx = 0
      while (bx < 8) {
        val base = blockValue(seed, bx, by)
        val v = if (bx == pbx && by == pby) (base + 128) % 256 else base
        val rgb = (v << 16) | (v << 8) | v
        var y = by * 4
        while (y < by * 4 + 4) {
          var x = bx * 4
          while (x < bx * 4 + 4) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        bx += 1
      }
      by += 1
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

  /** 64-bit difference hash (dHash) over decoded pixels: sample a 9×8
    * luma grid with the same deterministic floor rule as
    * [[resizeNearestPng]] (grid point (x, y) reads source pixel
    * (x·w/9, y·h/8); luma = r+g+b sum, 0..765 — integer, no rounding), then
    * bit y·8+x = 1 iff luma(x,y) < luma(x+1,y). Pure integer pipeline end
    * to end, so the hash is pixel-exact and reproducible on any JVM —
    * near-duplicate images (re-encodes, small edits, minor crops) differ in
    * a few bits, unrelated images in ~32. None for null/undecodable. */
  def dHash64(bytes: Array[Byte]): Option[Long] = decode(bytes).map(dHashOf)

  def dHashOf(img: BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val lum = new Array[Int](9 * 8)
    var y = 0
    while (y < 8) {
      val sy = y * h / 8
      var x = 0
      while (x < 9) {
        val rgb = img.getRGB(x * w / 9, sy)
        lum(y * 9 + x) =
          ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var bit = 0
    y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (lum(y * 9 + x) < lum(y * 9 + x + 1)) hash |= (1L << bit)
        bit += 1
        x += 1
      }
      y += 1
    }
    hash
  }

  /** 64-bit DCT perceptual hash (pHash): 32×32 luma sample (same floor
    * rule), 2-D DCT-II, keep the lowest-frequency 8×8 block, threshold
    * each coefficient against the mean of the block EXCLUDING the DC term
    * (the standard pHash variant — DC is overall brightness and would
    * dominate the mean). Doubles, but every step is fixed-order IEEE
    * arithmetic on integer-derived inputs, so the hash is deterministic
    * across JVMs. More robust than [[dHash64]] to global brightness /
    * contrast shifts; a few times the compute. */
  def pHash64(bytes: Array[Byte]): Option[Long] = decode(bytes).map { img =>
    val n = 32
    val w = img.getWidth
    val h = img.getHeight
    val lum = new Array[Double](n * n)
    var y = 0
    while (y < n) {
      val sy = y * h / n
      var x = 0
      while (x < n) {
        val rgb = img.getRGB(x * w / n, sy)
        lum(y * n + x) =
          (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)).toDouble
        x += 1
      }
      y += 1
    }
    // DCT-II, low 8×8 block only: 64 output coefficients × n² inputs —
    // O(64·1024) per image, no FFT needed at this size
    val cos = Array.tabulate(8, n)((u, i) =>
      math.cos((2 * i + 1) * u * math.Pi / (2.0 * n)))
    val coef = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var yy = 0
        while (yy < n) {
          var xx = 0
          while (xx < n) {
            s += lum(yy * n + xx) * cos(u)(yy) * cos(v)(xx)
            xx += 1
          }
          yy += 1
        }
        coef(u * 8 + v) = s
        v += 1
      }
      u += 1
    }
    var mean = 0.0
    var i = 1
    while (i < 64) { mean += coef(i); i += 1 }
    mean /= 63.0
    var hash = 0L
    i = 0
    while (i < 64) {
      if (coef(i) > mean) hash |= (1L << i)
      i += 1
    }
    hash
  }

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
