package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkTestBase

class JsonlSourceSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("text", StringType)))

  test("round-trip with quarantine: every line is either recovered or quarantined") {
    val path = "target/graft_test_jsonl"
    val docs = Seq((1L, "plain"), (2L, "esc \"quotes\" and \n newline"),
      (3L, "unicode é中")).toDF("id", "text")
    JsonlSource.write(docs, path)
    // corrupt the file: append malformed + blank lines like a real dump
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path, "extra.txt"),
      "{broken\n\n{\"id\": oops}\n".getBytes("UTF-8"))
    val (good, bad) = JsonlSource.read(spark, path, schema)
    val got = good.as[(Long, String)].collect().toSet
    assert(got == Set((1L, "plain"), (2L, "esc \"quotes\" and \n newline"),
      (3L, "unicode é中")), "JSON escaping must round-trip exactly")
    val q = bad.as[String].collect().toSet
    assert(q == Set("{broken", "{\"id\": oops}"),
      "malformed lines quarantine verbatim; blank lines are ignored")
  }

  test("valid JSON with missing fields is a good row with nulls, not quarantine") {
    val path = "target/graft_test_jsonl2"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path, "part.txt"),
      "{\"id\": 7}\n{\"text\": \"no id\"}\n".getBytes("UTF-8"))
    val (good, bad) = JsonlSource.read(spark, path, schema)
    assert(bad.count() == 0)
    val rows = good.select(col("id"), col("text")).collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
        Option(r.getString(1)).getOrElse(""))).toSet
    assert(rows == Set((7L, ""), (-1L, "no id")))
  }
}
