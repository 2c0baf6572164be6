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
