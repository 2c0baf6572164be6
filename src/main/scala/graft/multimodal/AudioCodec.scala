package graft.multimodal

import java.io.ByteArrayInputStream

import javax.sound.sampled.AudioSystem

/** Real audio codec on JDK-only `javax.sound.sampled` (WAV/PCM — the
  * java.desktop module ships the RIFF reader, no external dependencies),
  * the audio twin of [[ImageCodec]]: container truths (sample rate, frame
  * count) come from the ACTUAL decoded stream, features from the decoded
  * samples. Compressed codecs (mp3/ogg) have no JDK decoder and stay on
  * the stub path.
  *
  * PCM decode is bit-exact (it is a memcpy plus sign/endian handling), so
  * integer sample statistics are oracle-exact, like PNG pixels. */
object AudioCodec {

  /** Decoded-audio summary: header truths + exact integer mean |sample|
    * (floor semantics) + per-bucket mean |sample| in [0,1] over
    * `FeatureBuckets` equal time slices. */
  final case class WavInfo(sampleRate: Int, nFrames: Long, meanAbs: Int,
                           features: Array[Float])

  val FeatureBuckets = 16

  /** Deterministic 16-bit mono little-endian PCM WAV bytes — a manual RIFF
    * header, so the fixture is byte-stable across JVMs (the GATE never
    * compares bytes, only decode-side recovery of the parameters). */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Decode + analyze via AudioSystem; None for null/undecodable bytes
    * (quarantine semantics — never a mid-scan throw). Only 16-bit PCM is
    * analyzed (the training-fixture contract); other PCM widths return
    * header truths with empty features. */
  def analyze(bytes: Array[Byte]): Option[WavInfo] = {
    if (bytes == null) return None
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val nFrames = in.getFrameLength
        val rate = fmt.getSampleRate.toInt
        if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1)
          return Some(WavInfo(rate, nFrames, 0, Array.empty[Float]))
        val raw = in.readAllBytes()
        val n = raw.length / 2
        val bb = java.nio.ByteBuffer.wrap(raw).order(
          if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
          else java.nio.ByteOrder.LITTLE_ENDIAN)
        val sums = new Array[Long](FeatureBuckets)
        val counts = new Array[Long](FeatureBuckets)
        var total = 0L
        var i = 0
        while (i < n) {
          val v = math.abs(bb.getShort(i * 2).toLong)
          val bkt = math.min(FeatureBuckets - 1,
            (i.toLong * FeatureBuckets / math.max(1, n)).toInt)
          sums(bkt) += v
          counts(bkt) += 1
          total += v
          i += 1
        }
        val feats = new Array[Float](FeatureBuckets)
        var b = 0
        while (b < FeatureBuckets) {
          if (counts(b) > 0)
            feats(b) = (sums(b).toDouble / (32768.0 * counts(b))).toFloat
          b += 1
        }
        Some(WavInfo(rate, nFrames,
          if (n == 0) 0 else (total / n).toInt, feats))
      } finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }
  }

  /** Drop-in bytes→features kernel for audio content — same seam as
    * [[ImageCodec.imageFeatures]], stub fallback for undecodable bytes. */
  def audioFeatures(bytes: Array[Byte]): Array[Float] =
    analyze(bytes).filter(_.features.nonEmpty).map(_.features)
      .getOrElse(Multimodal.decodeStub(bytes))
}
