package graft.ann

import graft.SparkTestBase

class VectorHygieneSpec extends SparkTestBase {
  import spark.implicits._

  private val good = Array(0.6f, 0.8f) // norm2 = 1.0 exactly

  test("each corruption class gets its reason; clean survives") {
    val rows = Seq(
      (1L, good),
      (2L, Array(Float.NaN, 0.5f)),
      (3L, Array(Float.PositiveInfinity, 0.5f)),
      (4L, Array(0.0f, 0.0f)),
      (5L, Array(0.6f, 0.8f, 0.1f)),           // wrong dim
      (6L, Array(0.06f, 0.08f)),               // norm2 0.01 < 0.5
      (7L, Array(6.0f, 8.0f))                  // norm2 100 > 2
    ).toDF("vec_id", "embedding")
    val got = VectorHygiene.annotate(rows, "embedding", 2, 0.5, 2.0)
      .select("vec_id", "reason", "clean")
      .as[(Long, String, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == (("clean", true)))
    assert(got(2L) == (("nan_or_inf", false)))
    assert(got(3L) == (("nan_or_inf", false)), "Inf must be caught (isnan alone misses it)")
    assert(got(4L) == (("zero_vector", false)))
    assert(got(5L) == (("wrong_dim", false)))
    assert(got(6L) == (("norm_low", false)))
    assert(got(7L) == (("norm_high", false)))
  }

  test("a null vector is quarantined, not three-valued-logic'd to clean") {
    val rows = Seq((1L, good), (2L, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding")
    val got = VectorHygiene.annotate(rows, "embedding", 2, 0.5, 2.0)
      .select("vec_id", "reason", "clean")
      .as[(Long, String, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(2L) == (("null_vector", false)))
    assert(got(1L) == (("clean", true)))
    assert(VectorHygiene.clean(rows, "embedding", 2, 0.5, 2.0).count() == 1)
  }

  test("clean() preserves projection and keeps only indexable vectors") {
    val rows = Seq((1L, good), (2L, Array(Float.NaN, 1.0f)))
      .toDF("vec_id", "embedding")
    val kept = VectorHygiene.clean(rows, "embedding", 2, 0.5, 2.0)
    assert(kept.columns.toSeq == Seq("vec_id", "embedding"))
    assert(kept.as[(Long, Array[Float])].collect().map(_._1).toSeq == Seq(1L))
  }

  test("quarantineStats rolls up per reason") {
    val rows = Seq(
      (1L, good), (2L, good),
      (3L, Array(Float.NaN, 1.0f)),
      (4L, Array(0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val stats = VectorHygiene.quarantineStats(rows, "embedding", 2, 0.5, 2.0)
      .as[(String, Long)].collect().toMap
    assert(stats == Map("clean" -> 2L, "nan_or_inf" -> 1L, "zero_vector" -> 1L))
  }
}
