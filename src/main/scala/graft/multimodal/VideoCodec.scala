package graft.multimodal

/** Real ISO-BMFF (MP4) CONTAINER parsing — the video lane of the codec
  * triad. The JDK ships no video frame decoder, so frame DECODE stays on
  * the documented stub ([[Multimodal.sampleFrames]]); what a pipeline can
  * honestly extract without native codecs is the container metadata, and
  * that part is real: a box walker over the ISO 14496-12 structure reads
  * `moov/mvhd`'s timescale and duration from the actual bytes. The fixture
  * writer emits a minimal `ftyp`+`moov(mvhd)` file, byte-stable by
  * construction. */
object VideoCodec {

  final case class Mp4Info(timescale: Long, duration: Long) {
    /** whole seconds, floor — exact integer arithmetic for oracles. */
    def durationSeconds: Long = if (timescale == 0) 0 else duration / timescale
  }

  /** Minimal valid-enough MP4: ftyp(isom) + moov containing an mvhd v0
    * with the given timescale/duration (all other mvhd fields zeroed —
    * readers that only need timing accept this; the GATE only checks
    * decode-side recovery of these two numbers). */
  def encodeMp4Meta(timescale: Int, duration: Int): Array[Byte] = {
    def box(kind: String, payload: Array[Byte]): Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(8 + payload.length)
      buf.putInt(8 + payload.length)
      buf.put(kind.getBytes("US-ASCII"))
      buf.put(payload)
      buf.array()
    }
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ Array[Byte](0, 0, 2, 0) ++
        "isomiso2".getBytes("US-ASCII"))
    // mvhd version 0: fullbox(4) + ctime(4) + mtime(4) + timescale(4) +
    // duration(4) + rate..next_track (76 more zeroed bytes)
    val mvhdPayload = java.nio.ByteBuffer.allocate(100)
    mvhdPayload.putInt(0) // version+flags
    mvhdPayload.putInt(0) // creation
    mvhdPayload.putInt(0) // modification
    mvhdPayload.putInt(timescale)
    mvhdPayload.putInt(duration)
    val moov = box("moov", box("mvhd", mvhdPayload.array()))
    ftyp ++ moov
  }

  /** Minimal MP4 WITH a real sample table: ftyp + moov(mvhd +
    * trak/mdia/minf/stbl/stsz) + mdat holding the concatenated sample
    * payloads. stsz carries per-sample sizes (sample_size=0 → table
    * form), which is all [[parseSampleHashes]] needs to recover each
    * sample's byte range. */
  def encodeMp4WithSamples(timescale: Int, duration: Int,
                           samples: Array[Array[Byte]]): Array[Byte] = {
    def box(kind: String, payload: Array[Byte]): Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(8 + payload.length)
      buf.putInt(8 + payload.length)
      buf.put(kind.getBytes("US-ASCII"))
      buf.put(payload)
      buf.array()
    }
    val meta = encodeMp4Meta(timescale, duration)
    // encodeMp4Meta = ftyp ++ moov(mvhd); rebuild moov to add the trak
    val stszPayload = java.nio.ByteBuffer.allocate(12 + 4 * samples.length)
    stszPayload.putInt(0)              // version+flags
    stszPayload.putInt(0)              // sample_size = 0 -> per-sample table
    stszPayload.putInt(samples.length) // sample_count
    samples.foreach(s => stszPayload.putInt(s.length))
    val trak = box("trak", box("mdia", box("minf",
      box("stbl", box("stsz", stszPayload.array())))))
    val mvhdBox = {
      // extract the mvhd box bytes from the meta's moov (fixed layout:
      // ftyp is 24 bytes, moov header 8, then mvhd)
      java.util.Arrays.copyOfRange(meta, 32, meta.length)
    }
    val moov = box("moov", mvhdBox ++ trak)
    val ftyp = java.util.Arrays.copyOfRange(meta, 0, 24)
    val mdat = box("mdat", samples.flatten)
    ftyp ++ moov ++ mdat
  }

  /** Per-sample content hashes from the REAL container structure: stsz
    * sizes partition the mdat payload into sample byte ranges, each hashed
    * with the engine's shared byte-range hash. None (quarantine) for
    * null/truncated/structurally-inconsistent bytes — including an stsz
    * that claims more bytes than mdat holds. Pixel-level decode still has
    * no JDK codec; this is the honest container-aware signature a
    * dedup pass can extract without native decoders. */
  def parseSampleHashes(bytes: Array[Byte]): Option[Array[Long]] = {
    if (bytes == null || bytes.length < 8) return None
    try {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      def findBox(start: Int, end: Int, kind: String): Option[(Int, Int)] = {
        var off = start
        while (off + 8 <= end) {
          val size = bb.getInt(off).toLong & 0xffffffffL
          val k = new String(bytes, off + 4, 4, "US-ASCII")
          if (size < 8 || off + size > end) return None
          if (k == kind) return Some((off + 8, off + size.toInt))
          off += size.toInt
        }
        None
      }
      def findPath(start: Int, end: Int, path: List[String]): Option[(Int, Int)] =
        path match {
          case Nil => Some((start, end))
          case k :: rest => findBox(start, end, k).flatMap {
            case (s, e) => findPath(s, e, rest)
          }
        }
      for {
        (stszStart, stszEnd) <- findPath(0, bytes.length,
          List("moov", "trak", "mdia", "minf", "stbl", "stsz"))
        (mdatStart, mdatEnd) <- findBox(0, bytes.length, "mdat")
        hashes <- {
          if (stszStart + 12 > stszEnd) None
          else {
            val fixedSize = bb.getInt(stszStart + 4)
            val count = bb.getInt(stszStart + 8)
            if (count < 0 || fixedSize < 0) None
            else {
              val sizes: Option[Array[Int]] =
                // validate BEFORE allocating: a crafted count must not
                // reserve gigabytes ahead of the total<=mdat check below
                if (fixedSize > 0) {
                  if (fixedSize.toLong * count > (mdatEnd - mdatStart).toLong)
                    None
                  else Some(Array.fill(count)(fixedSize))
                }
                else if (stszStart + 12 + 4L * count > stszEnd) None
                else Some(Array.tabulate(count)(i =>
                  bb.getInt(stszStart + 12 + 4 * i)))
              sizes.flatMap { sz =>
                if (sz.exists(_ < 0)) None
                else {
                  val total = sz.foldLeft(0L)(_ + _)
                  if (total > (mdatEnd - mdatStart).toLong) None
                  else {
                    var off = mdatStart
                    Some(sz.map { s =>
                      val h = graft.functions.Hash64.hashByteRange(bytes, off, off + s)
                      off += s
                      h
                    })
                  }
                }
              }
            }
          }
        }
      } yield hashes
    } catch { case _: IndexOutOfBoundsException => None }
  }

  /** Walk the top-level boxes for `moov`, then its children for `mvhd`
    * (v0 or v1); None for null/non-MP4/truncated bytes — quarantine
    * semantics, never a throw. */
  def parseMvhd(bytes: Array[Byte]): Option[Mp4Info] = {
    if (bytes == null || bytes.length < 8) return None
    try {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      def findBox(start: Int, end: Int, kind: String): Option[(Int, Int)] = {
        var off = start
        while (off + 8 <= end) {
          val size = bb.getInt(off).toLong & 0xffffffffL
          val k = new String(bytes, off + 4, 4, "US-ASCII")
          if (size < 8 || off + size > end) return None
          if (k == kind) return Some((off + 8, off + size.toInt))
          off += size.toInt
        }
        None
      }
      for {
        (moovStart, moovEnd) <- findBox(0, bytes.length, "moov")
        (mvhdStart, mvhdEnd) <- findBox(moovStart, moovEnd, "mvhd")
        info <- {
          val version = bytes(mvhdStart) & 0xff
          if (version == 0 && mvhdStart + 20 <= mvhdEnd)
            Some(Mp4Info(bb.getInt(mvhdStart + 12).toLong & 0xffffffffL,
              bb.getInt(mvhdStart + 16).toLong & 0xffffffffL))
          else if (version == 1 && mvhdStart + 32 <= mvhdEnd)
            Some(Mp4Info(bb.getInt(mvhdStart + 20).toLong & 0xffffffffL,
              bb.getLong(mvhdStart + 24)))
          else None
        }
      } yield info
    } catch { case _: IndexOutOfBoundsException => None }
  }
}
