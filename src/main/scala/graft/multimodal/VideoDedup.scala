package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StructType}

import graft.dedup.TextDedup

/** VIDEO near-duplicate detection — the container lane of the multimodal
  * dedup triad ([[ImageDedup]] pixels, [[AudioDedup]] PCM envelope): each
  * video's REAL ISO-BMFF sample table ([[VideoCodec.parseSampleHashes]] —
  * stsz sizes partitioning the mdat payload) yields one content hash per
  * sample, and near-duplicates are videos whose distinct sample-hash SETS
  * overlap above a Jaccard threshold, mined by the shared key engine
  * ([[TextDedup.keyJaccardPairs]]). Re-encoded-pixel variants need a
  * native frame decoder (none in the JDK — documented stub); this catches
  * the container-level duplicate classes a crawl actually has: identical
  * re-uploads, re-muxed copies, trims, and splices that preserve sample
  * payloads.
  *
  * Scale shape: one mapPartitions parse per blob (video bytes never
  * shuffle), 8-byte sample ids through the pair join, hot-sample cap for
  * degenerate payloads (black frames, padding) via maxSampleDocFreq. */
object VideoDedup {

  /** Distinct `(idCol, shash)` sample-hash relation; unparseable/null
    * blobs yield no rows (quarantine — same contract as the image and
    * audio lanes). */
  def sampleHashes(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val in = df.select(col(idCol), col(binCol))
    val schema = StructType(Seq(in.schema.fields(0),
      in.schema.fields(1).copy(name = "hashes",
        dataType = ArrayType(LongType, containsNull = false))))
    implicit val enc = Encoders.row(schema)
    in.mapPartitions { rows =>
      rows.flatMap { r =>
        VideoCodec.parseSampleHashes(r.getAs[Array[Byte]](1))
          .map(hs => Row(r.get(0), hs.toSeq))
      }
    }.toDF(idCol, "hashes")
      .select(col(idCol), explode(array_distinct(col("hashes"))).as("shash"))
  }

  /** Near-duplicate video pairs `(ida, idb, jaccard)` with
    * `jaccard >= threshold` over distinct sample-hash sets. */
  def nearDupPairs(df: DataFrame, idCol: String, binCol: String,
                   threshold: Double,
                   maxSampleDocFreq: Option[Int] = None): DataFrame =
    TextDedup.keyJaccardPairs(sampleHashes(df, idCol, binCol),
      idCol, "shash", threshold, maxSampleDocFreq)
}
