package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** WARC (Web ARChive, ISO 28500) record source/sink — the container
  * format web crawls ship in (Common Crawl et al.), and therefore the
  * front door of a web-scale training corpus: WARC → response records →
  * HTML body → [[graft.text.UrlCurate]] / strip_html / the curation
  * pipeline.
  *
  * Scale shape: one WARC file is one stream — records are framed by
  * `Content-Length`, so the parser reads each file ONCE, record by
  * record, through a bounded buffer. A file is never materialized in
  * memory (Common Crawl files are ~1 GB); only the current record's
  * payload is (bounded by the per-record `Content-Length`, enforced at
  * [[WarcSource.maxRecordBytes]]). Files are the unit of parallelism —
  * the standard crawl layout is tens of thousands of ~1 GB files, far
  * more than executor slots, so per-file assignment load-balances
  * without intra-file splitting (gzip members make mid-file splits
  * impractical anyway).
  *
  * `.gz` files are decompressed inline; the JDK GZIPInputStream reads
  * concatenated members, covering both whole-file gzip and the
  * member-per-record layout crawls use.
  */
object WarcSource {

  /** Refuse records whose declared Content-Length exceeds this (256 MB):
    * the per-record memory bound that keeps a crafted or corrupt length
    * field from reserving arbitrary heap. */
  val maxRecordBytes: Long = 256L << 20

  /** One parsed WARC record. For `response` records carrying an HTTP
    * payload (`Content-Type: application/http...`) the HTTP envelope is
    * split off: `http_status` / `http_content_type` come from the HTTP
    * headers and `body` is the entity bytes. For every other record
    * `body` is the raw WARC payload, `http_status` is -1 and
    * `http_content_type` null. */
  case class WarcRecord(
      warc_file: String,
      record_type: String,
      target_uri: String,
      warc_date: String,
      content_type: String,
      http_status: Int,
      http_content_type: String,
      body: Array[Byte])

  /** Hadoop Configuration is not Serializable; ship it to tasks via
    * its own writable form (Spark's internal wrapper is private). */
  private class SerializableHadoopConf(
      @transient var value: org.apache.hadoop.conf.Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject(); value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new org.apache.hadoop.conf.Configuration(false)
      value.readFields(in)
    }
  }

  /** Parse every WARC record under `pathSpec` (a file, directory, or
    * glob; `.gz` decompressed inline).
    *
    * `lenient = true` (default): a malformed or truncated record stops
    * that FILE's parse at the last well-formed record — the realistic
    * failure is a truncated tail, and one bad file must not kill a
    * 100 TB job. Audit completeness by comparing per-file record counts
    * against the crawl manifest. `lenient = false` throws with a
    * file + record diagnostic instead. */
  def read(spark: SparkSession, pathSpec: String,
           lenient: Boolean = true): Dataset[WarcRecord] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(pathSpec)
    val fs = p.getFileSystem(conf)
    // bounded planning collect: the file listing (the same class of
    // driver work every Spark file scan does)
    val files = Option(fs.globStatus(p)).getOrElse(Array.empty).toSeq
      .flatMap { st =>
        if (st.isDirectory) fs.listStatus(st.getPath).toSeq.filter(_.isFile)
        else Seq(st)
      }
      .map(_.getPath)
      .filterNot(f => f.getName.startsWith("_") || f.getName.startsWith("."))
      .map(_.toString).sorted
    require(files.nonEmpty, s"WarcSource.read: no files match $pathSpec")
    readFiles(spark, files, lenient)
  }

  /** [[read]] over an explicit file list — the form a manifest-driven
    * ingest loop ([[graft.streaming.WarcIngest]]) hands its batch to. */
  def readFiles(spark: SparkSession, files: Seq[String],
                lenient: Boolean = true): Dataset[WarcRecord] = {
    import spark.implicits._
    require(files.nonEmpty, "WarcSource.readFiles: empty file list")
    val sconf = new SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    spark.createDataset(files)
      .repartition(math.min(files.size, spark.sparkContext.defaultParallelism))
      .mapPartitions { paths =>
        // the task-completion listener closes whatever stream is open when
        // the task ends early (limit/take abandon the iterator mid-file) —
        // without it each unconsumed file leaks an FS handle + Inflater
        val current = new java.util.concurrent.atomic.AtomicReference[InputStream]()
        Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] { _ =>
          val s = current.get()
          if (s != null) { try s.close() catch { case _: Exception => } }
        })
        paths.flatMap { f =>
          // lenient covers the OPEN too (missing file, bad gzip header —
          // GZIPInputStream reads the header eagerly): one corrupt or
          // vanished file must not kill the job. `raw` is closed on any
          // open-path failure — the completion listener only knows about
          // streams that made it into `current`.
          var raw: InputStream = null
          try {
            val path = new Path(f)
            raw = path.getFileSystem(sconf.value).open(path)
            val in: InputStream =
              if (f.endsWith(".gz")) new GZIPInputStream(raw) else raw
            val buffered = new BufferedInputStream(in, 1 << 16)
            current.set(buffered)
            recordIterator(f, buffered, lenient)
          } catch {
            case e: Exception if lenient =>
              if (raw != null) { try raw.close() catch { case _: Exception => } }
              System.err.println(s"[warc] skipping unreadable $f: $e")
              Iterator.empty
            case e: Exception =>
              if (raw != null) { try raw.close() catch { case _: Exception => } }
              throw new java.io.IOException(s"WarcSource: cannot open $f", e)
          }
        }
      }
  }

  /** Write WARC files (one `part-NNNNN.warc.gz` per non-empty
    * partition), each led by a `warcinfo` record. Expects columns
    * `target_uri` string, `warc_date` string, `http_status` int,
    * `http_content_type` string, `body` binary; each row becomes a
    * `response` record wrapping an HTTP envelope — the inverse of the
    * [[read]] response split, for round-trips and interchange. */
  def write(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(path)
    val fsDriver = dir.getFileSystem(conf)
    if (fsDriver.exists(dir)) fsDriver.delete(dir, true)
    fsDriver.mkdirs(dir)
    val sconf = new SerializableHadoopConf(conf)
    val cols = Seq("target_uri", "warc_date", "http_status",
      "http_content_type", "body")
    df.select(cols.head, cols.tail: _*).foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        if (rows.hasNext) {
          val part = TaskContext.getPartitionId()
          val file = new Path(path, f"part-$part%05d.warc.gz")
          val out = new BufferedOutputStream(new GZIPOutputStream(
            file.getFileSystem(sconf.value).create(file, true)), 1 << 16)
          try {
            // record ids: deterministic under task retry (same partition
            // re-emits the same ids) but unique per record — (partition,
            // sequence) disambiguates re-crawls of one uri+date
            var seq = 0L
            writeRecord(out, "warcinfo", null, "2000-01-01T00:00:00Z",
              "application/warc-fields",
              "software: graft\r\n".getBytes(StandardCharsets.UTF_8),
              s"warcinfo|$part|$seq")
            rows.foreach { r =>
              seq += 1
              val body = r.getAs[Array[Byte]]("body")
              val http = (s"HTTP/1.1 ${r.getAs[Int]("http_status")} OK\r\n" +
                s"Content-Type: ${r.getAs[String]("http_content_type")}\r\n" +
                s"Content-Length: ${body.length}\r\n\r\n")
                .getBytes(StandardCharsets.UTF_8)
              writeRecord(out, "response", r.getAs[String]("target_uri"),
                r.getAs[String]("warc_date"),
                "application/http;msgtype=response", http ++ body,
                s"response|${r.getAs[String]("target_uri")}|$part|$seq")
            }
          } finally out.close()
        }
    }
  }

  // ------------------------------------------------------------ internals

  private def writeRecord(out: java.io.OutputStream, rtype: String,
                          uri: String, date: String, ctype: String,
                          payload: Array[Byte], idSeed: String): Unit = {
    val id = java.util.UUID.nameUUIDFromBytes(
      idSeed.getBytes(StandardCharsets.UTF_8))
    val hdr = new StringBuilder()
      .append("WARC/1.0\r\n")
      .append(s"WARC-Type: $rtype\r\n")
      .append(s"WARC-Record-ID: <urn:uuid:$id>\r\n")
      .append(s"WARC-Date: $date\r\n")
    if (uri != null) hdr.append(s"WARC-Target-URI: $uri\r\n")
    hdr.append(s"Content-Type: $ctype\r\n")
      .append(s"Content-Length: ${payload.length}\r\n\r\n")
    out.write(hdr.toString.getBytes(StandardCharsets.UTF_8))
    out.write(payload)
    out.write("\r\n\r\n".getBytes(StandardCharsets.UTF_8))
  }

  /** Header/magic lines are short; a "line" growing past this is not a
    * WARC file (binary garbage with no 0x0A would otherwise buffer
    * wholesale before the magic check could reject it). */
  private val maxLineBytes = 1 << 20

  /** One line, bytes-until-LF, trailing CR stripped; null at clean EOF. */
  private def readLine(in: InputStream): String = {
    val buf = new java.io.ByteArrayOutputStream(128)
    var b = in.read()
    if (b < 0) return null
    while (b >= 0 && b != '\n') {
      if (buf.size() >= maxLineBytes)
        throw new java.io.IOException(
          s"line exceeds $maxLineBytes bytes (not a WARC stream)")
      buf.write(b); b = in.read()
    }
    val bytes = buf.toByteArray
    val n = if (bytes.nonEmpty && bytes(bytes.length - 1) == '\r')
      bytes.length - 1 else bytes.length
    new String(bytes, 0, n, StandardCharsets.UTF_8)
  }

  private def readFully(in: InputStream, n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val read = in.read(out, off, n - off)
      if (read < 0) throw new EOFException(s"truncated payload: $off of $n bytes")
      off += read
    }
    out
  }

  private def recordIterator(file: String, in: InputStream,
                             lenient: Boolean): Iterator[WarcRecord] = {
    new Iterator[WarcRecord] {
      private var nextRec: WarcRecord = _
      private var done = false
      private var recNo = 0

      private def parseNext(): WarcRecord = {
        var line = readLine(in)
        while (line != null && line.isEmpty) line = readLine(in)
        if (line == null) return null // clean EOF
        if (!line.startsWith("WARC/"))
          throw new java.io.IOException(
            s"$file record $recNo: expected WARC/ magic, got '${line.take(40)}'")
        val hdrs = scala.collection.mutable.Map.empty[String, String]
        var h = readLine(in)
        while (h != null && h.nonEmpty) {
          val i = h.indexOf(':')
          if (i < 0) throw new java.io.IOException(
            s"$file record $recNo: malformed header '${h.take(40)}'")
          hdrs(h.substring(0, i).trim.toLowerCase) = h.substring(i + 1).trim
          h = readLine(in)
        }
        if (h == null) throw new EOFException(s"$file record $recNo: EOF in headers")
        val lenStr = hdrs.getOrElse("content-length",
          throw new java.io.IOException(
            s"$file record $recNo: missing Content-Length"))
        val len = lenStr.toLongOption.getOrElse(
          throw new java.io.IOException(
            s"$file record $recNo: bad Content-Length '${lenStr.take(40)}'"))
        if (len < 0 || len > maxRecordBytes) throw new java.io.IOException(
          s"$file record $recNo: Content-Length $len outside [0, $maxRecordBytes]")
        val payload = readFully(in, len.toInt)
        recNo += 1
        val rtype = hdrs.getOrElse("warc-type", "")
        val ctype = hdrs.getOrElse("content-type", null)
        if (rtype == "response" && ctype != null &&
            ctype.startsWith("application/http")) {
          val (status, httpCt, body) = splitHttp(payload)
          WarcRecord(file, rtype, hdrs.getOrElse("warc-target-uri", null),
            hdrs.getOrElse("warc-date", null), ctype, status, httpCt, body)
        } else {
          WarcRecord(file, rtype, hdrs.getOrElse("warc-target-uri", null),
            hdrs.getOrElse("warc-date", null), ctype, -1, null, payload)
        }
      }

      private def advance(): Unit = {
        try { nextRec = parseNext(); if (nextRec == null) done = true }
        catch {
          case e: Exception if lenient => done = true
          case e: Throwable => try in.close() catch { case _: Exception => }; throw e
        }
        if (done) { try in.close() catch { case _: Exception => } }
      }

      override def hasNext: Boolean = {
        if (nextRec == null && !done) advance()
        nextRec != null
      }
      override def next(): WarcRecord = {
        if (!hasNext) throw new NoSuchElementException
        val r = nextRec; nextRec = null; r
      }
    }
  }

  /** Split an HTTP message payload into (status, Content-Type, entity
    * bytes); payloads with no header/body separator come back whole
    * with status -1. */
  private def splitHttp(payload: Array[Byte]): (Int, String, Array[Byte]) = {
    var i = 0
    var sep = -1
    while (sep < 0 && i + 3 < payload.length) {
      if (payload(i) == '\r' && payload(i + 1) == '\n' &&
          payload(i + 2) == '\r' && payload(i + 3) == '\n') sep = i
      i += 1
    }
    if (sep < 0) return (-1, null, payload)
    val head = new String(payload, 0, sep, StandardCharsets.ISO_8859_1)
    val lines = head.split("\r\n")
    val status = lines.headOption.map(_.split(" "))
      .filter(p => p.length >= 2 && p(0).startsWith("HTTP/"))
      .flatMap(p => p(1).toIntOption).getOrElse(-1)
    val httpCt = lines.drop(1)
      .find(_.toLowerCase.startsWith("content-type:"))
      .map(l => l.substring(l.indexOf(':') + 1).trim).orNull
    (status, httpCt, java.util.Arrays.copyOfRange(payload, sep + 4, payload.length))
  }
}
