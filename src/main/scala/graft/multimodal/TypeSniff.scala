package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Magic-byte media-type sniffing — the router in front of the
  * multimodal decode lanes: a 100 TB binary lake carries mislabeled and
  * extension-less content, and each decode lane ([[ImageCodec]],
  * [[AudioCodec]], [[VideoCodec]], the HTML lane) must only ever see
  * bytes of its own kind. Classification reads at most the first 12
  * bytes (one `substring` on the binary, then `hex` — never a full-blob
  * string materialization), entirely built-in expressions: scan-local,
  * zero shuffle, whole-stage codegen.
  *
  * Both engines compare the SAME uppercase hex prefixes (Spark `hex` ==
  * DuckDB `hex`), so the oracle replays classification exactly over
  * checkpointed bytes. `markup` is a deliberate router-grade rule —
  * leading `<` — covering HTML/XML/SVG without a charset-dependent
  * decode that RE2/UTF-8 strictness would make engine-specific. */
object TypeSniff {

  /** One of: png jpeg gif wav mp4 gzip zip pdf warc markup unknown.
    * Null or empty content → unknown. */
  def sniffMediaType(content: Column): Column = {
    val h = hex(substring(content, 1, 12)) // 24 uppercase hex chars
    when(content.isNull || length(content) === 0, lit("unknown"))
      .when(h.startsWith("89504E47"), lit("png"))          // \x89PNG
      .when(h.startsWith("FFD8FF"), lit("jpeg"))           // JPEG SOI
      .when(h.startsWith("47494638"), lit("gif"))          // GIF8
      .when(h.startsWith("52494646") &&
        substring(h, 17, 8) === "57415645", lit("wav"))    // RIFF....WAVE
      .when(substring(h, 9, 8) === "66747970", lit("mp4")) // size + ftyp
      .when(h.startsWith("1F8B"), lit("gzip"))
      .when(h.startsWith("504B0304"), lit("zip"))
      .when(h.startsWith("25504446"), lit("pdf"))          // %PDF
      .when(h.startsWith("574152432F"), lit("warc"))       // WARC/
      .when(h.startsWith("3C"), lit("markup"))             // <
      .otherwise(lit("unknown"))
  }

  /** The DuckDB replay of [[sniffMediaType]] over a BLOB-typed SQL
    * expression — kept beside the Scala so the two rule lists cannot
    * drift (the [[graft.functions.HtmlStrip]] pattern). */
  def sql(blobExpr: String): String =
    s"""CASE
       | WHEN $blobExpr IS NULL OR octet_length($blobExpr) = 0 THEN 'unknown'
       | WHEN substring(hex($blobExpr), 1, 8) = '89504E47' THEN 'png'
       | WHEN substring(hex($blobExpr), 1, 6) = 'FFD8FF' THEN 'jpeg'
       | WHEN substring(hex($blobExpr), 1, 8) = '47494638' THEN 'gif'
       | WHEN substring(hex($blobExpr), 1, 8) = '52494646'
       |  AND substring(hex($blobExpr), 17, 8) = '57415645' THEN 'wav'
       | WHEN substring(hex($blobExpr), 9, 8) = '66747970' THEN 'mp4'
       | WHEN substring(hex($blobExpr), 1, 4) = '1F8B' THEN 'gzip'
       | WHEN substring(hex($blobExpr), 1, 8) = '504B0304' THEN 'zip'
       | WHEN substring(hex($blobExpr), 1, 8) = '25504446' THEN 'pdf'
       | WHEN substring(hex($blobExpr), 1, 10) = '574152432F' THEN 'warc'
       | WHEN substring(hex($blobExpr), 1, 2) = '3C' THEN 'markup'
       | ELSE 'unknown' END""".stripMargin
}
