package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Perceptual image hashing + near-dup banding over real decoded pixels. */
class ImageDedupSpec extends SparkTestBase {
  import spark.implicits._

  /** Independent re-derivation of dHash from the blocks-PNG generator
    * arithmetic: sample point (x, y) reads source pixel (x·32/9, y·32/8),
    * whose block is (px/4, py/4), whose gray value is the generator
    * formula — no ImageCodec code on this path. */
  private def expectedBlocksDHash(seed: Long, pbx: Int, pby: Int): Long = {
    def blockVal(bx: Int, by: Int): Int = {
      var z = seed * 2654435761L + bx * 97L + by * 1013L
      z ^= z >>> 33
      z *= 0xff51afd7ed558ccdL
      z ^= z >>> 29
      val base = (z & 0xff).toInt
      if (bx == pbx && by == pby) (base + 128) % 256 else base
    }
    def luma(x: Int, y: Int): Int = {
      val px = x * 32 / 9
      val py = y * 32 / 8
      3 * blockVal(px / 4, py / 4)
    }
    var hash = 0L
    var bit = 0
    for (y <- 0 until 8; x <- 0 until 8) {
      if (luma(x, y) < luma(x + 1, y)) hash |= (1L << bit)
      bit += 1
    }
    hash
  }

  test("dHash is pixel-exact: decode path matches generator arithmetic") {
    for (seed <- Seq(0L, 1L, 7L, 39L); (pbx, pby) <- Seq((0, 0), (2, 6), (6, 2))) {
      val bytes = ImageCodec.encodeBlocksPng(seed, pbx, pby)
      assert(ImageCodec.dHash64(bytes).get ===
        expectedBlocksDHash(seed, pbx, pby), s"seed=$seed block=($pbx,$pby)")
    }
  }

  test("dHash: identical images 0 bits apart, one-block edits a few, different patterns many") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val a0 = ImageCodec.dHash64(ImageCodec.encodeBlocksPng(5, 0, 0)).get
    val a0b = ImageCodec.dHash64(ImageCodec.encodeBlocksPng(5, 0, 0)).get
    val a1 = ImageCodec.dHash64(ImageCodec.encodeBlocksPng(5, 2, 6)).get
    val b0 = ImageCodec.dHash64(ImageCodec.encodeBlocksPng(23, 0, 0)).get
    assert(ham(a0, a0b) == 0)
    assert(ham(a0, a1) > 0 && ham(a0, a1) <= 8, s"near-dup hamming ${ham(a0, a1)}")
    assert(ham(a0, b0) > 8, s"cross-pattern hamming ${ham(a0, b0)}")
  }

  test("pHash: deterministic, near-stable under a one-block edit, far across patterns") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val a0 = ImageCodec.pHash64(ImageCodec.encodeBlocksPng(5, 0, 0)).get
    val a0b = ImageCodec.pHash64(ImageCodec.encodeBlocksPng(5, 0, 0)).get
    val a1 = ImageCodec.pHash64(ImageCodec.encodeBlocksPng(5, 2, 6)).get
    val b0 = ImageCodec.pHash64(ImageCodec.encodeBlocksPng(23, 0, 0)).get
    assert(ham(a0, a0b) == 0)
    assert(ham(a0, a1) < ham(a0, b0),
      s"edit ${ham(a0, a1)} !< cross ${ham(a0, b0)}")
  }

  test("undecodable and null bytes quarantine to null sh; nearDupPairs drops them") {
    val rows = Seq(
      (1L, ImageCodec.encodeBlocksPng(3, 0, 0)),
      (2L, ImageCodec.encodeBlocksPng(3, 2, 6)),
      (3L, Array[Byte](1, 2, 3)),
      (4L, null.asInstanceOf[Array[Byte]])).toDF("id", "content")
    val sig = ImageDedup.fingerprints(rows, "id", "content")
      .as[(Long, Option[Long])].collect().toMap
    assert(sig(1L).isDefined && sig(2L).isDefined &&
      sig(3L).isEmpty && sig(4L).isEmpty)
    val pairs = ImageDedup.nearDupPairs(rows, "id", "content", maxHamming = 8)
      .as[(Long, Long, Int)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    assert(ImageDedup.fingerprints(rows, "id", "content", "phash")
      .where(col("sh").isNotNull).count() == 2)
  }

  test("nearDupPairs finds in-group edits, not cross-group patterns") {
    // 5 groups of 3: shared pattern per group, one shifted block per member
    val imgs = (0L until 15L).map { id =>
      val m = (id % 3).toInt
      (id, ImageCodec.encodeBlocksPng(id / 3, m * 2, m * 3 % 8))
    }.toDF("id", "content")
    val pairs = ImageDedup.nearDupPairs(imgs, "id", "content", maxHamming = 8)
      .as[(Long, Long, Int)].collect()
    // every pair found is within a group; every group contributes pairs
    assert(pairs.nonEmpty && pairs.forall(p => p._1 / 3 == p._2 / 3))
    assert(pairs.map(_._1 / 3).distinct.length == 5)
  }
}
