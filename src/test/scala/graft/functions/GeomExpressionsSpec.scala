package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.GeometryCodec

class GeomExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  private def wktDf(wkts: String*) =
    wkts.toSeq.toDF("wkt").withColumn("g", st_geomfromwkt(col("wkt")))

  test("st_geomfromwkt roundtrips and nulls malformed input") {
    val rows = wktDf("POINT (1 2)", "garbage", "", "POLYGON((0 0,1 0,1 1,0 1,0 0))")
      .select(st_astext(col("g"))).collect().map(_.getString(0))
    assert(rows(0) == "POINT (1 2)")
    assert(rows(1) == null)
    assert(rows(2) == null)
    assert(rows(3).startsWith("POLYGON"))
  }

  test("st_envelope matches JTS envelope") {
    val env = wktDf("POLYGON((0 0,4 0,4 3,0 3,0 0))")
      .select(st_envelope(col("g"))).head().getStruct(0)
    assert(env == Row(0.0, 0.0, 4.0, 3.0))
  }

  test("st_point / st_makebox construct exact geometries") {
    val df = Seq((1.0, 2.0)).toDF("x", "y")
      .select(st_astext(st_point(col("x"), col("y"))).as("p"),
              st_astext(st_makebox(lit(0.0), lit(0.0), col("x"), col("y"))).as("b"))
    val r = df.head()
    assert(r.getString(0) == "POINT (1 2)")
    assert(r.getString(1) == "POLYGON ((0 0, 1 0, 1 2, 0 2, 0 0))")
  }

  test("predicates agree with direct JTS calls") {
    val a = "POLYGON((0 0,2 0,2 2,0 2,0 0))"
    val b = "POLYGON((1 1,3 1,3 3,1 3,1 1))" // overlaps a
    val c = "POLYGON((2 0,4 0,4 2,2 2,2 0))" // touches a
    val d = "POLYGON((5 5,6 5,6 6,5 6,5 5))" // disjoint from a
    val inner = "POLYGON((0.5 0.5,1 0.5,1 1,0.5 1,0.5 0.5))" // within a
    val pairs = Seq((a, b), (a, c), (a, d), (a, inner), (a, a))
    val df = pairs.toDF("wa", "wb")
      .withColumn("ga", st_geomfromwkt(col("wa")))
      .withColumn("gb", st_geomfromwkt(col("wb")))
    val got = df.select(
      st_intersects($"ga", $"gb"), st_touches($"ga", $"gb"), st_crosses($"ga", $"gb"),
      st_contains($"ga", $"gb"), st_within($"ga", $"gb"), st_overlaps($"ga", $"gb"),
      st_equals($"ga", $"gb"), st_disjoint($"ga", $"gb"), st_adjacent($"ga", $"gb"))
      .collect()
    for ((row, (wa, wb)) <- got.zip(pairs)) {
      val g1 = GeometryCodec.fromWkt(wa); val g2 = GeometryCodec.fromWkt(wb)
      assert(row.getBoolean(0) == g1.intersects(g2), s"intersects $wa $wb")
      assert(row.getBoolean(1) == g1.touches(g2))
      assert(row.getBoolean(2) == g1.crosses(g2))
      assert(row.getBoolean(3) == g1.contains(g2))
      assert(row.getBoolean(4) == g1.within(g2))
      assert(row.getBoolean(5) == g1.overlaps(g2))
      assert(row.getBoolean(6) == g1.equalsTopo(g2))
      assert(row.getBoolean(7) == g1.disjoint(g2))
      assert(row.getBoolean(8) == !g1.disjoint(g2))
    }
  }

  test("distance / dwithin / area / overlay measures") {
    val df = Seq(("POINT (0 0)", "POINT (3 4)")).toDF("wa", "wb")
      .withColumn("ga", st_geomfromwkt(col("wa")))
      .withColumn("gb", st_geomfromwkt(col("wb")))
    val r = df.select(
      st_distance($"ga", $"gb"), st_dwithin($"ga", $"gb", lit(5.0)),
      st_dwithin($"ga", $"gb", lit(4.9))).head()
    assert(r.getDouble(0) == 5.0)
    assert(r.getBoolean(1)); assert(!r.getBoolean(2))

    val boxes = Seq(("POLYGON((0 0,2 0,2 2,0 2,0 0))", "POLYGON((1 1,3 1,3 3,1 3,1 1))"))
      .toDF("wa", "wb")
      .withColumn("ga", st_geomfromwkt(col("wa")))
      .withColumn("gb", st_geomfromwkt(col("wb")))
    val m = boxes.select(
      st_area($"ga"), st_intersection_area($"ga", $"gb"), st_union_area($"ga", $"gb"),
      st_jaccard($"ga", $"gb"), st_dice($"ga", $"gb")).head()
    assert(m.getDouble(0) == 4.0)
    assert(m.getDouble(1) == 1.0)
    assert(m.getDouble(2) == 7.0)
    assert(m.getDouble(3) == 1.0 / 7.0)
    assert(m.getDouble(4) == 2.0 / 8.0)
  }

  test("overlay ops on invalid (bowtie) geometry return null, not throw") {
    // self-intersecting bowtie is invalid; JTS overlay may throw TopologyException
    val bowtie = "POLYGON((0 0,2 2,2 0,0 2,0 0))"
    val df = Seq((bowtie, bowtie)).toDF("wa", "wb")
      .withColumn("ga", st_geomfromwkt(col("wa")))
      .withColumn("gb", st_geomfromwkt(col("wb")))
    // must evaluate without throwing; null result acceptable
    df.select(st_intersection($"ga", $"gb"), st_jaccard($"ga", $"gb")).collect()
  }

  test("hilbert values are locality-preserving and within range") {
    val order = 8
    val vals = Seq((0.0, 0.0), (0.001, 0.001), (0.999, 0.0), (0.5, 0.5))
      .toDF("x", "y")
      .select(hilbert(col("x"), col("y"), lit(order))).collect().map(_.getLong(0))
    val n = 1L << (2 * order)
    assert(vals.forall(v => v >= 0 && v < n))
    assert(math.abs(vals(0) - vals(1)) < 8) // near points -> near curve positions
  }

  test("st_discretize: ceil-affine remap, holes preserved, skipComplex drops") {
    import graft.core.Mbb
    val donut = "POLYGON((0 0,10 0,10 10,0 10,0 0),(2 2,4 2,4 4,2 4,2 2))"
    val tri = "POLYGON((1 1,3 1,1 3,1 1))"
    val df = Seq((1L, donut), (2L, tri)).toDF("id", "wkt")
      .withColumn("g", st_geomfromwkt(col("wkt")))
    val out = df.select(col("id"),
        st_astext(st_discretize(col("g"), Mbb(0, 0, 10, 10), Mbb(0, 0, 100, 100)))
          .as("d"),
        st_astext(st_discretize(col("g"), Mbb(0, 0, 10, 10), Mbb(0, 0, 100, 100),
          skipComplex = true)).as("dk"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    // vertices map by ceil((c-0)/10*100+0) = 10c exactly; the hole survives
    // as its own ring (discretize_cords.cpp:296-308)
    assert(out(1L)._1.contains("(20 20, 40 20, 40 40, 20 40, 20 20)"))
    assert(out(1L)._2 == null, "skipComplex must drop polygons with holes (-k)")
    assert(out(2L)._1 == "POLYGON ((10 10, 30 10, 10 30, 10 10))")
    assert(out(2L)._2 != null, "skipComplex keeps hole-free polygons")
    // non-integral landings round UP (ceil), the reference's formula
    val p = Seq(Tuple1("POLYGON((1 1,2 1,1 2,1 1))")).toDF("wkt")
      .select(st_astext(st_discretize(st_geomfromwkt(col("wkt")),
        Mbb(0, 0, 3, 3), Mbb(0, 0, 10, 10))))
      .head().getString(0)
    assert(p == "POLYGON ((4 4, 7 4, 4 7, 4 4))") // 10/3=3.33->4, 20/3=6.67->7
  }

  test("SQL registration exposes functions to spark.sql") {
    registerAll(spark)
    val r = spark.sql(
      "SELECT st_area(st_makebox(0D, 0D, 2D, 3D)) a, " +
      "st_intersects(st_point(1D,1D), st_makebox(0D,0D,2D,2D)) b").head()
    assert(r.getDouble(0) == 6.0 && r.getBoolean(1))
    val r2 = spark.sql(
      "SELECT st_npoints(st_makebox(0D,0D,1D,1D)) n, " +
      "st_astext(st_discretize(st_makebox(1D,1D,2D,2D), " +
      "0D,0D,10D,10D, 0D,0D,100D,100D)) d").head()
    assert(r2.getInt(0) == 5)
    assert(r2.getString(1) == "POLYGON ((10 10, 20 10, 20 20, 10 20, 10 10))")
    // the crawl kernels are SQL-reachable too
    val rCrawl = spark.sql(
      "SELECT canonicalize_url('HTTPS://WWW.X.COM:443/a/?utm_s=1&b=2#f') u, " +
        "size(html_blocks('<nav><a>x</a></nav><p>prose</p>')) nb").head()
    assert(rCrawl.getString(0) == "https://x.com/a?b=2")
    assert(rCrawl.getInt(1) == 2)
    // sig_agreement: null elements count as non-agreeing, never throw
    val r3 = spark.sql(
      "SELECT sig_agreement(array(1L, CAST(NULL AS LONG), 3L), array(1L, 2L, 3L)) c").head()
    assert(r3.getInt(0) == 2)
    // st_discretize argument validation fails fast with a clear message
    val err = intercept[Exception](spark.sql(
      "SELECT st_discretize(st_point(1D,1D), 0D,0D,10D,10D, 0D,0D,100D,100D, 1) d").head())
    assert(err.getMessage.contains("boolean literal"))
    // text kernels with literal-int parameters
    val r4 = spark.sql(
      "SELECT word_shingles('a b a b', 2) ws, " +
      "word_shingles_all('a b a b', 2) wsa, " +
      "remove_covered_tokens('a b c d', array(1), 2) cut").head()
    assert(r4.getSeq[String](0) == Seq("a b", "b a"))
    assert(r4.getSeq[String](1) == Seq("a b", "b a", "a b"))
    assert(r4.getString(2) == "a d")
    val err2 = intercept[Exception](spark.sql(
      "SELECT word_shingles('x', n) w FROM VALUES (2) t(n)").head())
    assert(err2.getMessage.contains("integer literal"))
  }
}
