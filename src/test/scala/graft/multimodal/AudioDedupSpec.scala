package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Energy-envelope audio hashing + near-dup banding over real decoded PCM. */
class AudioDedupSpec extends SparkTestBase {
  import spark.implicits._

  /** Independent re-derivation of aHash64 from the blocks-WAV generator:
    * segments align 1:1 with the 65 envelope buckets, so envelope(k) is
    * exactly the segment amplitude — no AudioCodec decode on this path. */
  private def expectedBlocksAHash(seed: Long, pSeg: Int): Long = {
    def amp(s: Int): Int = {
      var z = seed * 2654435761L + s * 10007L
      z ^= z >>> 33
      z *= 0xff51afd7ed558ccdL
      z ^= z >>> 29
      val base = (z & 0x7fff).toInt
      if (s == pSeg) (base + 16384) % 32768 else base
    }
    var hash = 0L
    for (b <- 0 until 64) if (amp(b) < amp(b + 1)) hash |= (1L << b)
    hash
  }

  test("aHash is sample-exact: decode path matches generator arithmetic") {
    for (seed <- Seq(0L, 1L, 7L, 39L); p <- Seq(0, 13, 39, 64)) {
      val bytes = AudioCodec.encodeBlocksWav(seed, p)
      assert(AudioCodec.aHash64(bytes).get === expectedBlocksAHash(seed, p),
        s"seed=$seed pSeg=$p")
    }
  }

  test("aHash: identical clips 0 apart, one-segment edits a few, different envelopes many") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val a0 = AudioCodec.aHash64(AudioCodec.encodeBlocksWav(5, 0)).get
    val a0b = AudioCodec.aHash64(AudioCodec.encodeBlocksWav(5, 0)).get
    val a1 = AudioCodec.aHash64(AudioCodec.encodeBlocksWav(5, 26)).get
    val b0 = AudioCodec.aHash64(AudioCodec.encodeBlocksWav(23, 0)).get
    assert(ham(a0, a0b) == 0)
    assert(ham(a0, a1) > 0 && ham(a0, a1) <= 8, s"near-dup hamming ${ham(a0, a1)}")
    assert(ham(a0, b0) > 8, s"cross-envelope hamming ${ham(a0, b0)}")
  }

  test("quarantine: null, garbage, and non-mono-PCM16 content yield null sh") {
    val stereoish = Array[Byte](1, 2, 3, 4) // not a RIFF container
    val rows = Seq(
      (1L, AudioCodec.encodeBlocksWav(3, 0)),
      (2L, AudioCodec.encodeBlocksWav(3, 26)),
      (3L, stereoish),
      (4L, null.asInstanceOf[Array[Byte]])).toDF("id", "content")
    val sig = AudioDedup.fingerprints(rows, "id", "content")
      .as[(Long, Option[Long])].collect().toMap
    assert(sig(1L).isDefined && sig(2L).isDefined &&
      sig(3L).isEmpty && sig(4L).isEmpty)
    val pairs = AudioDedup.nearDupPairs(rows, "id", "content", maxHamming = 8)
      .as[(Long, Long, Int)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
  }

  test("nearDupPairs finds in-group edits, not cross-group envelopes") {
    val clips = (0L until 15L).map { id =>
      val m = (id % 3).toInt
      (id, AudioCodec.encodeBlocksWav(id / 3, m * 13 % 65))
    }.toDF("id", "content")
    val pairs = AudioDedup.nearDupPairs(clips, "id", "content", maxHamming = 8)
      .as[(Long, Long, Int)].collect()
    assert(pairs.nonEmpty && pairs.forall(p => p._1 / 3 == p._2 / 3))
    assert(pairs.map(_._1 / 3).distinct.length == 5)
  }
}
