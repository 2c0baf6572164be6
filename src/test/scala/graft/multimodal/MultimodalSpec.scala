package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def binDf = Seq(
      (1L, "fake-jpeg-content-aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),
      (2L, "fake-jpeg-content-bbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbb"),
      (3L, "fake-jpeg-content-aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"))
    .toDF("media_id", "payload")
    .withColumn("content", col("payload").cast("binary")).drop("payload")

  test("withMediaMeta: typed metadata struct, deterministic dims") {
    val df = Multimodal.withMediaMeta(binDf, "content", "image/jpeg")
    assert(df.schema("media_meta").dataType == Multimodal.MediaMetaType)
    val rows = df.select("media_id", "media_meta.media_type",
        "media_meta.width", "media_meta.height").collect()
    assert(rows.forall(_.getString(1) == "image/jpeg"))
    val byId = rows.map(r => r.getLong(0) -> (r.getInt(2), r.getInt(3))).toMap
    assert(byId(1L) == byId(3L), "identical bytes -> identical inferred dims")
    assert(byId(1L) != byId(2L))
    assert(rows.forall(r => r.getInt(2) >= 64 && r.getInt(2) < 1088))
  }

  test("withFeatures: mapPartitions batch decode, fixed dim, deterministic") {
    val df = Multimodal.withFeatures(binDf, "content")
    assert(df.columns.contains("features"))
    val rows = df.select("media_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(rows.values.forall(_.length == Multimodal.FeatureDim))
    assert(rows(1L) == rows(3L))
    assert(rows(1L) != rows(2L))
    assert(rows(1L).forall(f => f >= -1.0f && f <= 1.0f))
    // repartitioning must not change results (partition-independent decode)
    val rep = Multimodal.withFeatures(binDf.repartition(3), "content")
      .select("media_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(rep == rows)
  }

  test("resize rewrites metadata dims; sampleFrames explodes 1->N") {
    val meta = Multimodal.withMediaMeta(binDf, "content", "video/mp4")
    val resized = Multimodal.resize(meta, "content", "media_meta", 224, 224)
    val dims = resized.select("media_meta.width", "media_meta.height").head()
    assert(dims.getInt(0) == 224 && dims.getInt(1) == 224)

    val frames = Multimodal.sampleFrames(binDf, "content", stride = 1, frameBytes = 16)
    val n = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 54-byte payloads, 16-byte frames -> 4 frames each
    assert(n.values.forall(_ == 4L))
    assert(frames.schema("frame").dataType.typeName == "binary")
    // frame_no is the PER-VIDEO sampled-frame index: exactly 0..n-1 within
    // each source row (not a global partition-encoded id)
    val perVideo = frames.repartition(3).select("media_id", "frame_no").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).sorted.toSeq).toMap
    assert(perVideo.values.forall(_ == Seq(0L, 1L, 2L, 3L)))
    // stride skips frames but the sampled index stays dense from 0
    val strided = Multimodal.sampleFrames(binDf, "content", stride = 2, frameBytes = 16)
      .select("media_id", "frame_no").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).sorted.toSeq).toMap
    assert(strided.values.forall(_ == Seq(0L, 1L)))
  }

  test("ImageCodec: real PNG encode->decode roundtrip recovers dims and pixels") {
    val png = ImageCodec.encodePng(40, 24, 0x555555)
    val info = ImageCodec.analyze(png).get
    assert(info.width == 40 && info.height == 24)
    assert(info.meanLuma == 0x55, "uniform color -> exact integer mean")
    // uniform image: every grid cell's luminance mean is gray/255 exactly
    assert(info.features.length == 16)
    assert(info.features.forall(f => math.abs(f - 0x55 / 255.0f) < 1e-6f))
  }

  test("ImageCodec: gradient features match stored expected cell means") {
    // horizontal 0..255 gradient, 32x8, grid 4x4: cell column c covers
    // x in [8c, 8c+8), luma(x) = x*255/31 (int division) — expected means
    // computed independently of the codec
    val png = ImageCodec.encodeGradientPng(32, 8)
    val info = ImageCodec.analyze(png).get
    assert(info.width == 32 && info.height == 8)
    val expected = (0 until 4).map { c =>
      val lumas = (8 * c until 8 * c + 8).map(x => (x * 255) / 31)
      (lumas.sum.toDouble / (255.0 * lumas.length)).toFloat
    }
    (0 until 16).foreach { cell =>
      assert(math.abs(info.features(cell) - expected(cell % 4)) < 1e-6f,
        s"cell $cell: ${info.features(cell)} vs ${expected(cell % 4)}")
    }
    // rows are identical -> all four grid rows carry the same features
    assert(info.features.slice(0, 4).toSeq == info.features.slice(12, 16).toSeq)
  }

  test("ImageCodec: undecodable bytes fall back to the stub, nulls are quarantined") {
    val junk = "definitely-not-an-image".getBytes
    assert(ImageCodec.analyze(junk).isEmpty)
    assert(ImageCodec.imageFeatures(junk).toSeq == Multimodal.decodeStub(junk).toSeq)
    assert(ImageCodec.analyze(null).isEmpty)
  }

  test("AudioCodec: real WAV encode->decode roundtrip recovers rate/frames/amplitude") {
    // constant amplitude: exact integer mean |sample|
    val wav = AudioCodec.encodeWavPcm16(16000, Array.fill(128)(700.toShort))
    val info = AudioCodec.analyze(wav).get
    assert(info.sampleRate == 16000 && info.nFrames == 128L)
    assert(info.meanAbs == 700)
    assert(info.features.length == 16)
    assert(info.features.forall(f => math.abs(f - 700 / 32768.0f) < 1e-6f))
    // ramp fixture: per-bucket means computed independently of the codec
    val ramp = Array.tabulate(160)(i => (i * 10).toShort)
    val rInfo = AudioCodec.analyze(AudioCodec.encodeWavPcm16(8000, ramp)).get
    val expected = (0 until 16).map { b =>
      val vals = (b * 10 until b * 10 + 10).map(_ * 10)
      (vals.sum.toDouble / (32768.0 * vals.length)).toFloat
    }
    (0 until 16).foreach { b =>
      assert(math.abs(rInfo.features(b) - expected(b)) < 1e-6f, s"bucket $b")
    }
    assert(AudioCodec.analyze("not-audio".getBytes).isEmpty)
    assert(AudioCodec.analyze(null).isEmpty)
    assert(AudioCodec.audioFeatures("junk".getBytes).toSeq ==
      Multimodal.decodeStub("junk".getBytes).toSeq)
  }

  test("analyzeAudio: one-pass real decode over a DataFrame, null-safe") {
    val rows = Seq(
      (1L, AudioCodec.encodeWavPcm16(8000, Array.fill(64)(500.toShort))),
      (2L, null.asInstanceOf[Array[Byte]]))
    val out = Multimodal.analyzeAudio(rows.toDF("media_id", "content"), "content")
    val byId = out.select("media_id", "media_meta.sample_rate",
        "media_meta.n_frames", "mean_abs")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getInt(1) == 8000 && byId(1L).getInt(2) == 64)
    assert(byId(1L).getInt(3) == 500)
    assert(byId(2L).isNullAt(1) && byId(2L).isNullAt(3))
  }

  test("VideoCodec: ISO-BMFF box walk recovers mvhd timescale/duration; junk is quarantined") {
    val mp4 = VideoCodec.encodeMp4Meta(1200, 36000)
    val info = VideoCodec.parseMvhd(mp4).get
    assert(info.timescale == 1200L && info.duration == 36000L)
    assert(info.durationSeconds == 30L)
    // the walker must skip leading boxes (ftyp), not assume moov-first
    assert(new String(mp4.slice(4, 8), "US-ASCII") == "ftyp")
    assert(VideoCodec.parseMvhd("nope".getBytes).isEmpty)
    assert(VideoCodec.parseMvhd(null).isEmpty)
    assert(VideoCodec.parseMvhd(mp4.take(20)).isEmpty, "truncated moov must quarantine")
  }

  test("analyzeImages: one-pass real decode over a DataFrame, null-safe") {
    val rows = Seq(
      (1L, ImageCodec.encodePng(20, 10, 0xff0000)), // red: meanLuma 255/3=85
      (2L, ImageCodec.encodeGradientPng(16, 16)),
      (3L, null.asInstanceOf[Array[Byte]]))
    val df = rows.toDF("media_id", "content")
    val out = Multimodal.analyzeImages(df.repartition(2), "content")
    val byId = out.select("media_id", "media_meta.width", "media_meta.height", "mean_luma")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getInt(1) == 20 && byId(1L).getInt(2) == 10)
    assert(byId(1L).getInt(3) == 85)
    assert(byId(2L).getInt(1) == 16)
    assert(byId(3L).isNullAt(1) && byId(3L).isNullAt(3))
    val feats = out.where(col("media_id") === 2L)
      .select("features").head().getSeq[Float](0)
    assert(feats.length == 16 && feats.sum > 0f)
  }

  test("resizeNearestPng: floor-sampled pixels, exact up/downscale, null quarantine") {
    // downscale 40x20 gradient -> 24x12 and upscale 5x3 -> 10x9: every
    // output pixel must equal source pixel (x*w/outW, y*h/outH)
    for ((w, h, ow, oh) <- Seq((40, 20, 24, 12), (5, 3, 10, 9))) {
      val src = ImageCodec.encodeGradientPng(w, h)
      val rz = ImageCodec.resizeNearestPng(src, ow, oh).get
      val s = ImageCodec.decode(src).get
      val o = ImageCodec.decode(rz).get
      assert(o.getWidth == ow && o.getHeight == oh)
      for (y <- 0 until oh; x <- 0 until ow)
        assert((o.getRGB(x, y) & 0xffffff) ==
          (s.getRGB(x * w / ow, y * h / oh) & 0xffffff),
          s"pixel ($x,$y) of ${w}x$h -> ${ow}x$oh")
    }
    assert(ImageCodec.resizeNearestPng(Array[Byte](1, 2, 3), 4, 4).isEmpty)
    assert(ImageCodec.resizeNearestPng(null, 4, 4).isEmpty)
    // DataFrame stage: resized column present, undecodable row -> null
    val df = Seq(
      (1L, ImageCodec.encodeGradientPng(30, 10)),
      (2L, Array[Byte](9, 9, 9))).toDF("media_id", "content")
    val out = Multimodal.resizeImages(df, "content", 8, 4)
      .select(col("media_id"), col("resized"))
      .collect().map(r => r.getLong(0) -> r.get(1)).toMap
    assert(out(2L) == null)
    val info = ImageCodec.analyze(out(1L).asInstanceOf[Array[Byte]]).get
    assert(info.width == 8 && info.height == 4)
  }
}
