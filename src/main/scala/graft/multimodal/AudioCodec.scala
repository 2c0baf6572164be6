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

  /** Deterministic segment amplitude (0..32767) for the near-dup WAV
    * fixture family — the audio twin of [[ImageCodec.blockValue]]'s
    * splitmix-style mix (a linear formula would make adjacent-segment
    * comparisons seed-independent). */
  def segAmp(seed: Long, seg: Int): Int = {
    var z = seed * 2654435761L + seg * 10007L
    z ^= z >>> 33
    z *= 0xff51afd7ed558ccdL
    z ^= z >>> 29
    (z & 0x7fff).toInt
  }

  /** 65-segment blocky WAV fixture (8 kHz, 64 constant samples per
    * segment — segments align 1:1 with [[aHash64]]'s 65 envelope buckets,
    * so a spec or oracle re-derives the hash from [[segAmp]] arithmetic
    * alone): segment `pSeg` is shifted +16384 (mod 32768), giving the
    * same near-dup group structure as [[ImageCodec.encodeBlocksPng]]. */
  def encodeBlocksWav(seed: Long, pSeg: Int): Array[Byte] = {
    val samples = new Array[Short](65 * 64)
    var s = 0
    while (s < 65) {
      val base = segAmp(seed, s)
      val amp = (if (s == pSeg) (base + 16384) % 32768 else base).toShort
      var i = s * 64
      val end = i + 64
      while (i < end) { samples(i) = amp; i += 1 }
      s += 1
    }
    encodeWavPcm16(8000, samples)
  }

  /** 64-bit energy-envelope difference hash over decoded PCM — the audio
    * analog of [[ImageCodec.dHash64]]: mean |sample| over 65 equal time
    * slices (exact integer sums; bucket of sample i = i·65/n, floor), bit
    * i = 1 iff envelope(i) < envelope(i+1). The hash captures the SHAPE
    * of the loudness envelope, so re-encodes and moderate gain changes
    * keep most bits while unrelated audio lands ~32 away. (A
    * spectral-domain fingerprint — Chromaprint class — is the
    * heavier-duty production choice; the JDK ships no FFT, and the
    * envelope hash keeps the whole pipeline deterministic
    * integer-then-fixed-IEEE arithmetic, which is what makes the gate's
    * checkpointed hash table spec-pinnable.) None for null/undecodable
    * or non-16-bit/non-mono content (quarantine semantics). */
  def aHash64(bytes: Array[Byte]): Option[Long] = {
    if (bytes == null) return None
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) return None
        val raw = in.readAllBytes()
        val n = raw.length / 2
        if (n == 0) return None
        val bb = java.nio.ByteBuffer.wrap(raw).order(
          if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
          else java.nio.ByteOrder.LITTLE_ENDIAN)
        val sums = new Array[Long](65)
        val counts = new Array[Long](65)
        var i = 0
        while (i < n) {
          val bkt = math.min(64, (i.toLong * 65 / n).toInt)
          sums(bkt) += math.abs(bb.getShort(i * 2).toLong)
          counts(bkt) += 1
          i += 1
        }
        var hash = 0L
        var b = 0
        while (b < 64) {
          val e0 = if (counts(b) == 0) 0.0 else sums(b).toDouble / counts(b)
          val e1 = if (counts(b + 1) == 0) 0.0 else sums(b + 1).toDouble / counts(b + 1)
          if (e0 < e1) hash |= (1L << b)
          b += 1
        }
        Some(hash)
      } finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }
  }
}
