package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The vector/text expressions generate real code (no CodegenFallback) so
  * the ANN refine and document-scan stages stay inside whole-stage codegen.
  * Spark silently falls back to interpreted eval when generated code fails
  * to compile — this spec removes that escape hatch by pinning
  * `spark.sql.codegen.factoryMode` to CODEGEN_ONLY (janino errors then
  * throw), and asserts the generated results bit-match interpreted eval. */
class CodegenParitySpec extends SparkTestBase {

  private def df = {
    import spark.implicits._
    Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f, 3.0f), "the quick brown fox", Seq(1L, 2L, 3L, 4L), Seq(1L, 9L, 3L, 8L)),
      (2L, Seq(0.5f, -1.5f, 2.5f), Seq(-1.0f, 0.0f, 4.0f), "lorem ipsum dolor sit amet", Seq(5L, 6L, 7L, 8L), Seq(5L, 6L, 7L, 8L)),
      (3L, Seq(0.0f, 0.0f, 0.0f), Seq(1.0f, 1.0f, 1.0f), "", Seq(1L), Seq(2L)),
      (4L, Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f), "x", Seq(), Seq())
    ).toDF("id", "va", "vb", "txt", "sa", "sb")
  }

  private def results(mode: String): Seq[Row] = {
    spark.conf.set("spark.sql.codegen.factoryMode", mode)
    try df.select(col("id"),
        cosine_similarity(col("va"), col("vb")).as("cos"),
        dot_product(col("va"), col("vb")).as("dot"),
        simhash64(col("txt")).as("sim"),
        rolling_hash64(col("txt")).as("roll"),
        seeded_hash64(col("txt"), lit(7L)).as("seeded"),
        sig_agreement(col("sa"), col("sb")).as("agree"))
      .orderBy("id").collect().toSeq
    finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }

  test("generated code compiles and bit-matches interpreted eval") {
    val gen = results("CODEGEN_ONLY")
    val interp = results("NO_CODEGEN")
    assert(gen == interp)
    // spot-check semantics survived the rewrite
    val byId = gen.map(r => r.getLong(0) -> r).toMap
    assert(math.abs(byId(1L).getDouble(1) - 1.0) < 1e-12) // identical vectors
    assert(byId(1L).getDouble(2) == 14.0)                  // 1+4+9
    assert(byId(3L).isNullAt(1))                           // zero-norm -> null
    assert(byId(4L).isNullAt(1) && byId(4L).isNullAt(2))   // length mismatch
    assert(byId(2L).getInt(6) == 4)                        // all positions agree
    assert(byId(1L).getInt(6) == 2)                        // positions 1,3 agree
  }
}
