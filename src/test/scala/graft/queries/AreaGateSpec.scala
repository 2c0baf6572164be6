package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The area-growth scale lane (`*_area` gates): copy-block geometry that
  * translates each ScaleData copy (key + copy·10⁷) into its own 400-unit
  * block instead of stacking it onto the base lattice.
  *
  * Pins the two contracts the lane rests on:
  *  1. at un-stacked SFs (every key < 10⁷ → copy index 0) each `_area`
  *     twin is bit-identical to its base gate — so the driver's sf0.01
  *     oracle run checks the derivation without new fixtures;
  *  2. on stacked data the blocks are spatially independent for the
  *     bounded-reach joins (output grows ∝ copies, vs copies² for the
  *     stacked base gates), and the global kNN twins stay exact even
  *     when a winner crosses blocks.
  */
class AreaGateSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("area twins == base gates on un-stacked data (copy index 0)") {
    val pairs: Seq[(DataFrame, DataFrame)] = Seq(
      Queries.qSpjoinIntersectsArea(spark, dir) -> Queries.qSpjoinIntersects(spark, dir),
      Queries.qSpjoinDwithinArea(spark, dir) -> Queries.qSpjoinDwithin(spark, dir),
      Queries.qSpjoinContainsArea(spark, dir) -> Queries.qSpjoinContains(spark, dir),
      Queries.qKnnArea(spark, dir) -> Queries.qKnn(spark, dir),
      Queries.qSpjoin3dArea(spark, dir) -> Queries.qSpjoin3d(spark, dir),
      Queries.qKnn3dArea(spark, dir) -> Queries.qKnn3d(spark, dir))
    pairs.zipWithIndex.foreach { case ((area, base), i) =>
      val a = rows(area); val b = rows(base)
      assert(a.nonEmpty, s"pair $i produced no rows")
      assert(a == b, s"pair $i: area twin diverges from base gate at copy 0")
    }
  }

  /** Two-copy stacked fixture: the sf0.001 keys plus the same keys shifted
    * by 10⁷ — exactly ScaleData's stacking, two copies. `copy1` holds the
    * shifted rows ALONE, so the base gates can be replayed per copy (the
    * block-independence denominators below). */
  private lazy val fixture: String = {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_area_fixture"
    def stack(name: String, key: String): Unit = {
      val base = spark.read.parquet(s"$dir/$name.parquet")
      val shifted = base.withColumn(key, col(key) + lit(10000000L))
      base.unionByName(shifted).write.mode("overwrite")
        .parquet(s"$out/$name.parquet")
      shifted.write.mode("overwrite").parquet(s"$out/copy1/$name.parquet")
    }
    stack("part", "p_partkey")
    stack("customer", "c_custkey")
    stack("supplier", "s_suppkey")
    out
  }

  test("stacked copies: area joins scale linearly (block-independent), stacked base gates square") {
    // Part-derived geometry is SHIFT-INVARIANT (its moduli 20/400 divide
    // 10⁷), so the self-join math is exact: stacking two copies onto one
    // lattice yields every original pair 2×2 ways plus each box paired
    // with its own byte-identical duplicate — the copies² growth the
    // stacked sf10 lane measures. Blocking breaks exactly that: per-copy
    // independence, linear yield.
    val baseN = Queries.qSpjoinIntersects(spark, dir).count()
    val nBoxes = spark.read.parquet(s"$dir/part.parquet").count()
    val stackedN = Queries.qSpjoinIntersects(spark, fixture).count()
    assert(stackedN == 4 * baseN + nBoxes, "stacked base self-join should square the yield")
    val areaPairs = Queries.qSpjoinIntersectsArea(spark, fixture)
      .select(col("id1"), col("id2")).collect()
    assert(areaPairs.length == 2 * baseN, "area twin should scale linearly in copies")
    assert(areaPairs.forall(r => r.getLong(0) / 10000000L == r.getLong(1) / 10000000L),
      "intersects_area pair crosses copy blocks")

    val base3dN = Queries.qSpjoin3d(spark, dir).count()
    val area3d = Queries.qSpjoin3dArea(spark, fixture)
      .select(col("id1"), col("id2")).collect()
    assert(area3d.length == 2 * base3dN, "3-D area twin should scale linearly")
    assert(area3d.forall(r => r.getLong(0) / 10000000L == r.getLong(1) / 10000000L),
      "3d_area pair crosses copy blocks")

    // Customer-derived geometry is NOT shift-invariant (7·10⁷ ≡ 100
    // mod 300: each copy's points translate on the 300-torus), so the
    // per-copy yield VARIES — the linear invariant is block
    // independence: the area join equals the base gate summed over each
    // copy's rows alone (block offsets cancel inside a block, so the
    // copy-c block replays the base gate on copy-c keys exactly).
    val perCopy = Seq(dir, s"$fixture/copy1")
      .map(d => Queries.qSpjoinDwithin(spark, d).count()).sum
    val areaD = Queries.qSpjoinDwithinArea(spark, fixture)
      .select(col("pid"), col("cid")).collect()
    assert(areaD.length == perCopy,
      "dwithin_area should equal the per-copy base-gate sum")
    assert(areaD.forall(r => r.getLong(0) / 10000000L == r.getLong(1) / 10000000L),
      "dwithin_area pair crosses copy blocks")
  }

  test("stacked copies: global kNN area twins equal brute force (cross-block legal)") {
    val custs = Queries.keyPointsArea(spark, fixture, "customer", "c_custkey", 7)
      .select(col("id").as("cid"), col("px").as("cx"), col("py").as("cy"))
    val supps = Queries.keyPointsArea(spark, fixture, "supplier", "s_suppkey", 13)
      .select(col("id").as("sid"), col("px").as("sx"), col("py").as("sy"))
    val d2 = (col("cx") - col("sx")) * (col("cx") - col("sx")) +
      (col("cy") - col("sy")) * (col("cy") - col("sy"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cid")).orderBy(d2.asc, col("sid").asc)
    val brute = rows(custs.crossJoin(supps)
      .withColumn("rk", row_number().over(w)).where(col("rk") <= 3)
      .select(col("cid"), col("sid"), col("rk")))
    val got = rows(Queries.qKnnArea(spark, fixture))
    assert(got == brute, "qKnnArea diverges from brute force on stacked fixture")

    // 3-D: same contract against the cube formula
    val c3 = spark.read.parquet(s"$fixture/customer.parquet").select(
      col("c_custkey").as("cid"),
      (((col("c_custkey") * 7) % 300).cast("double") +
        (floor(col("c_custkey") / 10000000L) % 5) * 400.0).as("cx"),
      ((floor(col("c_custkey") * 7 / 300) % 300).cast("double") +
        (floor(col("c_custkey") / 50000000L) % 5) * 400.0).as("cy"),
      (((col("c_custkey") % 20) * 10 + 5).cast("double") +
        floor(col("c_custkey") / 250000000L) * 400.0).as("cz"))
    val s3 = Queries.partCubesArea(spark, fixture)
      .select(col("id").as("sid"), col("x0"), col("y0"), col("z0"), col("w"))
    def gap(p: String, lo: String) =
      greatest(col(lo) - col(p), col(p) - col(lo) - col("w"), lit(0.0))
    val d3 = gap("cx", "x0") * gap("cx", "x0") +
      gap("cy", "y0") * gap("cy", "y0") + gap("cz", "z0") * gap("cz", "z0")
    val w3 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cid")).orderBy(d3.asc, col("sid").asc)
    val brute3 = rows(c3.crossJoin(s3)
      .withColumn("rk", row_number().over(w3)).where(col("rk") <= 3)
      .select(col("cid"), col("sid"), col("rk")))
    val got3 = rows(Queries.qKnn3dArea(spark, fixture))
    assert(got3 == brute3, "qKnn3dArea diverges from brute force on stacked fixture")
  }
}
