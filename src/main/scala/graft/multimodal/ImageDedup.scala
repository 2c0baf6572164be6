package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.dedup.TextDedup

/** IMAGE near-duplicate detection — the multimodal dedup operator a
  * training pipeline actually runs over a scraped image corpus: perceptual
  * hash per image ([[ImageCodec.dHash64]] / [[ImageCodec.pHash64]] over
  * real decoded pixels), then the SAME 16-bit band blocking + exact
  * Hamming machinery the text SimHash path uses
  * ([[TextDedup.simHashPairsFromFingerprints]]) — re-encodes, thumbnails,
  * and small edits land within a few bits of each other; unrelated images
  * at ~32.
  *
  * Scale shape: hashing is one mapPartitions decode pass (one decoder
  * context per partition, rows streamed — the image bytes never shuffle);
  * only the 8-byte fingerprints enter the band-bucket join, so the
  * shuffle volume is rows×(4 bands×~24 B), independent of image size.
  * Banding catches every pair with Hamming ≤ 3 exactly and most below ~16
  * — same guarantee as the text path, same skew story (a degenerate
  * all-black-images bucket is a hot key; cap with a bucket-size guard
  * upstream if the corpus has one).
  */
object ImageDedup {

  /** `(idCol, sh: long)` perceptual-hash fingerprint relation.
    * Undecodable/null bytes yield a null `sh` (quarantine semantics —
    * never a mid-scan throw); [[nearDupPairs]] filters them out, callers
    * keeping the relation can route them to review. `kind` is `dhash`
    * (integer-exact, fastest) or `phash` (DCT, brightness-robust). */
  def fingerprints(df: DataFrame, idCol: String, binCol: String,
                   kind: String = "dhash"): DataFrame = {
    val hashFn: Array[Byte] => Option[Long] = kind match {
      case "dhash" => ImageCodec.dHash64
      case "phash" => ImageCodec.pHash64
      case other => throw new IllegalArgumentException(
        s"fingerprint kind must be dhash|phash, got $other")
    }
    val in = df.select(col(idCol), col(binCol))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      in.schema.fields(0), in.schema.fields(1).copy(name = "sh", dataType = LongType)))
    implicit val enc = Encoders.row(schema)
    in.mapPartitions { rows =>
      rows.map { r =>
        val sh = hashFn(r.getAs[Array[Byte]](1))
          .map(java.lang.Long.valueOf).orNull
        Row(r.get(0), sh)
      }
    }.toDF(idCol, "sh")
  }

  /** Near-duplicate image pairs `(ida, idb, hamming)` with
    * `hamming <= maxHamming`, via band-blocked candidate generation over
    * the fingerprints — never an all-pairs compare. */
  def nearDupPairs(df: DataFrame, idCol: String, binCol: String,
                   maxHamming: Int, kind: String = "dhash"): DataFrame =
    TextDedup.simHashPairsFromFingerprints(
      fingerprints(df, idCol, binCol, kind).where(col("sh").isNotNull),
      idCol, maxHamming)
}
