package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL (newline-delimited JSON) corpus ingestion with QUARANTINE
  * semantics — the crawl-dump front door: every line either parses into
  * the declared schema or lands, verbatim, in a quarantine channel.
  * Nothing is silently dropped, and the quarantine relation is what a
  * pipeline monitors/replays after a parser fix.
  *
  * Built as text-scan + `from_json` (one codegen JsonToStructs per line)
  * rather than `spark.read.json`'s corrupt-record column: the corrupt
  * column can't be filtered without caching the whole parsed relation
  * (Spark disallows corrupt-column-only queries), while this form is a
  * pure scan-local projection — each branch prunes to what it reads, and
  * the file is scanned once per consumed branch. */
object JsonlSource {

  /** `(good, quarantine)`: good = parsed rows projected to `schema`'s
    * columns; quarantine = `(raw)` original lines that failed to parse.
    * Blank lines are ignored (not quarantined — JSONL writers commonly
    * end files with a newline). */
  def read(spark: SparkSession, path: String,
           schema: StructType): (DataFrame, DataFrame) = {
    // PERMISSIVE with an in-struct corrupt-record column: a malformed
    // line parses to a struct whose `_corrupt` carries the raw text —
    // the quarantine predicate — while FAILFAST would abort the job on
    // the first bad line (defeating quarantine) and bare PERMISSIVE
    // without the column would silently null-fill. Unlike
    // spark.read.json's top-level corrupt column, the in-struct form has
    // no "can't filter without caching" restriction.
    require(!schema.fieldNames.contains("_corrupt"),
      "JsonlSource.read: schema must not declare _corrupt (reserved)")
    val parseSchema = schema.add("_corrupt", org.apache.spark.sql.types.StringType)
    val parsed = spark.read.text(path)
      .where(length(trim(col("value"))) > 0)
      .select(col("value"),
        from_json(col("value"), parseSchema,
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> "_corrupt")).as("r"))
    val bad = col("r").isNull || col("r").getField("_corrupt").isNotNull
    val good = parsed.where(!bad)
      .select(schema.fieldNames.map(f => col("r").getField(f).as(f)).toIndexedSeq: _*)
    val quarantine = parsed.where(bad).select(col("value").as("raw"))
    (good, quarantine)
  }

  /** Write one JSON object per row (all columns), newline-delimited —
    * the inverse of [[read]] for round-trip tests and interchange. */
  def write(df: DataFrame, path: String): Unit =
    df.select(to_json(struct(df.columns.map(col).toIndexedSeq: _*)).as("value"))
      .write.mode("overwrite").text(path)
}
