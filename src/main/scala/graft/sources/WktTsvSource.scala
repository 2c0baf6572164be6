package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.st_geomfromwkt

/** The reference's native input format: schema-on-read TSV with one
  * user-chosen WKT column (S1 — resque_2d.cpp:306-307, tokenizer.h:6-132,
  * --shpidx at resque_params_2d.hpp:13-16). Non-geometry fields stay opaque
  * strings, carried through untouched (query_temp.rawdata semantics).
  *
  * The WKT parses ONCE at the scan boundary into the engine's WKB column
  * (the reference re-parses at every pipeline stage); malformed geometry ->
  * null + optional row drop, mirroring the mapper's permissive skip
  * (manipulate_2d.cpp:182-189).
  */
object WktTsvSource {

  /** @param shpIdx 1-based index of the WKT column (reference -i flag)
    * @param dropMalformed drop rows whose geometry fails to parse
    * @param nFields optional fixed field count; inferred from the first
    *                line when absent */
  def read(spark: SparkSession, path: String, shpIdx: Int,
           dropMalformed: Boolean = true,
           nFields: Option[Int] = None): DataFrame = {
    val n = nFields.getOrElse {
      val first = spark.read.text(path).limit(1).collect()
      require(first.nonEmpty, s"empty input $path")
      first.head.getString(0).split("\t", -1).length
    }
    require(shpIdx >= 1 && shpIdx <= n, s"shpIdx $shpIdx out of range 1..$n")
    val schema = StructType((1 to n).map(i => StructField(s"f$i", StringType)))
    val raw = spark.read
      .option("sep", "\t")
      .option("quote", "")      // reference tokenizer: no quoting, keep blanks
      .option("mode", "PERMISSIVE")
      .schema(schema)
      .csv(path)
    val withGeom = raw.withColumn("geom", st_geomfromwkt(col(s"f$shpIdx")))
    if (dropMalformed) withGeom.where(col("geom").isNotNull) else withGeom
  }

  /** S2: MBB record scan — `id x1 y1 x2 y2` rows (reference --mbbread,
    * manipulate_2d.cpp:105-109, SpaceStreamReader). */
  def readMbb(spark: SparkSession, path: String, sep: String = "\t",
              dropTrailer: Boolean = true): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", StringType),
      StructField("xmin", DoubleType), StructField("ymin", DoubleType),
      StructField("xmax", DoubleType), StructField("ymax", DoubleType)))
    val df = spark.read.option("sep", sep).schema(schema).csv(path)
      .where(col("xmin").isNotNull)
    // the reference's MBB streams carry a -1-keyed space-envelope trailer
    // (manipulate_2d.cpp:199-203)
    if (dropTrailer) df.where(col("id") =!= "-1") else df
  }

  /** Write back as TSV (geometry re-serialized into its column slot). */
  def write(df: DataFrame, path: String, shpIdx: Int): Unit = {
    val fields = df.columns.filter(_.startsWith("f"))
    val cols = fields.map { c =>
      if (c == s"f$shpIdx") graft.functions.st_astext(col("geom")) else col(c)
    }
    df.select(concat_ws("\t", cols.toIndexedSeq: _*).as("value"))
      .write.mode("overwrite").text(path)
  }
}
