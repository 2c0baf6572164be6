package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.dedup.TextDedup

/** AUDIO near-duplicate detection — the WAV twin of [[ImageDedup]]:
  * energy-envelope fingerprint per clip ([[AudioCodec.aHash64]] over real
  * decoded PCM), then the shared 16-bit band blocking + exact Hamming
  * stage ([[TextDedup.simHashPairsFromFingerprints]]). Same scale shape:
  * one mapPartitions decode pass (audio bytes never shuffle), 8-byte
  * fingerprints through the band-bucket join. */
object AudioDedup {

  /** `(idCol, sh: long)` envelope-hash relation; undecodable/null/
    * non-PCM16-mono bytes yield null `sh` (quarantine). */
  def fingerprints(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val in = df.select(col(idCol), col(binCol))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      in.schema.fields(0), in.schema.fields(1).copy(name = "sh", dataType = LongType)))
    implicit val enc = Encoders.row(schema)
    in.mapPartitions { rows =>
      rows.map { r =>
        val sh = AudioCodec.aHash64(r.getAs[Array[Byte]](1))
          .map(java.lang.Long.valueOf).orNull
        Row(r.get(0), sh)
      }
    }.toDF(idCol, "sh")
  }

  /** Near-duplicate clip pairs `(ida, idb, hamming)` with
    * `hamming <= maxHamming` via band-blocked candidates. */
  def nearDupPairs(df: DataFrame, idCol: String, binCol: String,
                   maxHamming: Int): DataFrame =
    TextDedup.simHashPairsFromFingerprints(
      fingerprints(df, idCol, binCol).where(col("sh").isNotNull),
      idCol, maxHamming)
}
