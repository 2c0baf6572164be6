package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Hash64
import org.apache.spark.unsafe.types.UTF8String

/** Multimodal-column plumbing for training-data pipelines: image/audio/video
  * as opaque `BinaryType` content + typed metadata, with decode/feature/
  * resize/frame-sample operators.
  *
  * IMAGE decode is REAL (JDK-only javax.imageio via [[ImageCodec]]:
  * PNG/JPEG/BMP/GIF dims + pixel-derived features, see [[analyzeImages]]).
  * AUDIO/VIDEO stay STUBBED (no JDK demuxer in this container):
  * `decodeStub` derives deterministic pseudo-features from the bytes, and
  * the Spark-side plumbing — schema, per-partition batch iteration,
  * operator signatures, partitioning behavior — is identical for both, so
  * swapping a stub for a real codec changes one function
  * ([[withFeatures]]' `codec` parameter).
  *
  * All per-row work runs in `mapPartitions` (the Scala analog of
  * `mapInPandas` batch processing): one decoder instance per partition, rows
  * streamed through an iterator, no driver collection.
  */
object Multimodal {

  /** media metadata struct carried next to every binary column. */
  val MediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image/jpeg, audio/wav, video/mp4
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType), // audio only
    StructField("n_frames", IntegerType)))   // video only

  val FeatureDim = 16

  /** Attach a metadata struct inferred from the (stub) container header:
    * deterministic content-derived dimensions. The entropy source is md5 —
    * identical hex in every engine — folded into small ints with plain
    * arithmetic, so a SQL oracle can re-derive the exact values end-to-end
    * (a real decoder would read them from the container instead). Pure
    * column expressions — stays inside whole-stage codegen. */
  def withMediaMeta(df: DataFrame, binCol: String, mediaType: String): DataFrame = {
    val m = md5(col(binCol))
    // 4 hex chars -> int via base-31 fold of their ascii codes
    def chunk(off: Int): Column = (0 until 4).map { i =>
      ascii(substring(m, off + i, 1)).cast(LongType) * lit(math.pow(31, 3 - i).toLong)
    }.reduce(_ + _)
    val nullInt = lit(null).cast(IntegerType)
    val meta = struct(
      lit(mediaType).as("media_type"),
      (lit(64) + pmod(chunk(1), lit(1024L))).cast(IntegerType).as("width"),
      (lit(64) + pmod(chunk(5), lit(1024L))).cast(IntegerType).as("height"),
      (if (mediaType.startsWith("audio"))
         (lit(8000) + pmod(chunk(9), lit(40000L))).cast(IntegerType)
       else nullInt).as("sample_rate"),
      (if (mediaType.startsWith("video"))
         (lit(1) + pmod(chunk(13), lit(300L))).cast(IntegerType)
       else nullInt).as("n_frames"))
    df.withColumn("media_meta",
      when(col(binCol).isNull, lit(null).cast(MediaMetaType)).otherwise(meta))
  }

  /** STUB decode: bytes -> FeatureDim pseudo-features in [-1,1], derived
    * from seeded content hashes (deterministic; replace with a real decoder
    * + model embedding for production). Runs per-partition, streaming. */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    if (bytes != null) {
      val s = UTF8String.fromBytes(bytes)
      var i = 0
      while (i < FeatureDim) {
        val h = Hash64.hash(s, 1000L + i)
        out(i) = (h.toDouble / Long.MaxValue.toDouble).toFloat
        i += 1
      }
    }
    out
  }

  /** binary -> feature vector column via per-partition batch processing.
    * `codec` is the bytes→features kernel: [[decodeStub]] by default,
    * [[ImageCodec.imageFeatures]] for real image decode — the promised
    * one-function swap, same plumbing. */
  def withFeatures(df: DataFrame, binCol: String, outCol: String = "features",
                   codec: Array[Byte] => Array[Float] = decodeStub): DataFrame = {
    val schema = df.schema.add(outCol, ArrayType(FloatType))
    val binIdx = df.schema.fieldIndex(binCol)
    implicit val enc = Encoders.row(schema)
    df.mapPartitions { rows =>
      // one decoder context per partition (where a real codec would init)
      rows.map { r =>
        val feat = codec(r.getAs[Array[Byte]](binIdx))
        Row.fromSeq(r.toSeq :+ feat.toSeq)
      }
    }.toDF(schema.fieldNames.toIndexedSeq: _*)
  }

  /** REAL image resize stage ([[ImageCodec.resizeNearestPng]]): appends a
    * `resized` binary column holding the (outW × outH) nearest-neighbor
    * PNG; undecodable/null inputs resize to null (quarantine semantics).
    * Same mapPartitions plumbing as every codec stage — one decode + one
    * encode per row, streaming per partition. The deterministic sampling
    * rule (floor source index) is what makes a resized-pixel oracle
    * possible: q_multimodal_resize re-analyzes the ACTUAL resized bytes
    * and the oracle re-derives mean luminance from generator arithmetic. */
  def resizeImages(df: DataFrame, binCol: String,
                   outW: Int, outH: Int): DataFrame = {
    val schema = df.schema.add("resized", BinaryType)
    val binIdx = df.schema.fieldIndex(binCol)
    implicit val enc = Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val rz = ImageCodec.resizeNearestPng(
          r.getAs[Array[Byte]](binIdx), outW, outH).orNull
        Row.fromSeq(r.toSeq :+ rz)
      }
    }.toDF(schema.fieldNames.toIndexedSeq: _*)
  }

  /** One-pass REAL image analysis (javax.imageio): media_meta with the
    * container's actual dims, grid-luminance features from decoded pixels,
    * and the exact integer mean luminance — one decode per row, streaming
    * per partition (decoding separately for meta and features would read
    * every image twice). Undecodable/null bytes yield null meta/features
    * (quarantine semantics, never a mid-scan throw). Non-image media keeps
    * using [[withMediaMeta]] + [[decodeStub]]. */
  def analyzeImages(df: DataFrame, binCol: String,
                    mediaType: String = "image/png"): DataFrame = {
    val schema = df.schema
      .add("media_meta", MediaMetaType)
      .add("features", ArrayType(FloatType))
      .add("mean_luma", IntegerType)
    val binIdx = df.schema.fieldIndex(binCol)
    implicit val enc = Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        ImageCodec.analyze(r.getAs[Array[Byte]](binIdx)) match {
          case Some(i) => Row.fromSeq(r.toSeq ++ Seq(
            Row(mediaType, i.width, i.height, null, null), i.features.toSeq, i.meanLuma))
          case None => Row.fromSeq(r.toSeq ++ Seq(null, null, null))
        }
      }
    }.toDF(schema.fieldNames.toIndexedSeq: _*)
  }

  /** One-pass REAL audio analysis (javax.sound.sampled, WAV/PCM) — the
    * audio twin of [[analyzeImages]]: media_meta with the container's
    * actual sample rate and frame count, per-time-bucket amplitude
    * features, exact integer mean |sample|. Undecodable/null bytes yield
    * null meta/features. */
  def analyzeAudio(df: DataFrame, binCol: String,
                   mediaType: String = "audio/wav"): DataFrame = {
    val schema = df.schema
      .add("media_meta", MediaMetaType)
      .add("features", ArrayType(FloatType))
      .add("mean_abs", IntegerType)
    val binIdx = df.schema.fieldIndex(binCol)
    implicit val enc = Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        AudioCodec.analyze(r.getAs[Array[Byte]](binIdx)) match {
          case Some(i) => Row.fromSeq(r.toSeq ++ Seq(
            Row(mediaType, null, null, i.sampleRate,
              if (i.nFrames > Int.MaxValue) null else i.nFrames.toInt),
            i.features.toSeq, i.meanAbs))
          case None => Row.fromSeq(r.toSeq ++ Seq(null, null, null))
        }
      }
    }.toDF(schema.fieldNames.toIndexedSeq: _*)
  }

  /** STUB resize: rewrites target dims in metadata and (stub) re-encodes
    * content as a truncated prefix — plumbing-real, codec-stub. */
  def resize(df: DataFrame, binCol: String, metaCol: String,
             w: Int, h: Int): DataFrame = {
    val resized = udf { (bytes: Array[Byte]) =>
      if (bytes == null) null
      else bytes.take(math.max(16, bytes.length / 2)) // stub re-encode
    }
    df.withColumn(binCol, resized(col(binCol)))
      .withColumn(metaCol, col(metaCol)
        .withField("width", lit(w)).withField("height", lit(h)))
  }

  /** STUB frame sampling: video binary -> every `stride`-th fixed-size
    * chunk as a frame (real impl: container demux). 1 row -> N frame rows
    * via posexplode, preserving lineage columns; `frame_no` is the PER-VIDEO
    * index of the sampled frame (0..n-1 within each source row — a global
    * monotonically_increasing_id would encode partition layout instead). */
  def sampleFrames(df: DataFrame, binCol: String, stride: Int,
                   frameBytes: Int = 256): DataFrame = {
    val frames = udf { (bytes: Array[Byte]) =>
      if (bytes == null) Array.empty[Array[Byte]]
      else bytes.grouped(frameBytes).zipWithIndex
        .collect { case (chunk, i) if i % stride == 0 => chunk }
        .toArray
    }
    df.select(col("*"), posexplode(frames(col(binCol))).as(Seq("__pos", "frame")))
      .withColumn("frame_no", col("__pos").cast(LongType))
      .drop("__pos")
  }
}
