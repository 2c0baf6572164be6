package graft.ann

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins the salted list-keyed scoring join ([[IvfIndex.listJoin]]) ==
  * the unsalted single-key join: an item carries exactly one salt and
  * queries replicate to every salt, so each (query, item) pair meets
  * exactly once and the result set is bit-identical for any factor. */
class ListSaltSpec extends SparkTestBase {
  import spark.implicits._

  private def vecs(n: Int, seed: Int) = (0 until n).map { i =>
    val r = new java.util.Random(seed + i)
    (i.toLong, Array.fill(8)(r.nextFloat()).toSeq)
  }.toDF("id", "vec")

  private def run(salt: String) = {
    spark.conf.set("spark.graft.ann.listSalt", salt)
    try {
      val items = vecs(300, 1).select(col("id").as("nid"), col("vec").as("ivec"))
      val queries = vecs(20, 999).select(col("id").as("qid"), col("vec").as("qvec"))
      val model = IvfIndex.train(items, "ivec", nlist = 4)
      IvfIndex.topK(items, "nid", "ivec", queries, "qid", "qvec",
          k = 5, model, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
        .sortBy(identity)
    } finally spark.conf.unset("spark.graft.ann.listSalt")
  }

  test("salted topK == unsalted topK (salt 1 vs 8)") {
    val unsalted = run("1")
    val salted = run("8")
    assert(unsalted.nonEmpty)
    assert(salted.sameElements(unsalted))
  }

  test("listSalt sizes to the cluster and disables at production nlist") {
    val par = spark.sparkContext.defaultParallelism
    assert(IvfIndex.listSalt(spark, nlist = 2 * par) == 1)
    assert(IvfIndex.listSalt(spark, nlist = 1) >= math.min(64, 2 * par))
  }
}
