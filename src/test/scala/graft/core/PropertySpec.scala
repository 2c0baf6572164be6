package graft.core

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HilbertValue
import graft.operators.TileIndex

/** ScalaCheck property tests for the driver-side geometry/tiling kernel
  * (SURVEY §5: property-based invariants). */
class PropertySpec extends AnyFunSuite {

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, s"$name: $res")
  }

  private val coord = Gen.chooseNum(-1000.0, 1000.0)
  private val mbbGen: Gen[Mbb] = for {
    x1 <- coord; y1 <- coord
    w <- Gen.chooseNum(0.0, 50.0); h <- Gen.chooseNum(0.0, 50.0)
  } yield Mbb(x1, y1, x1 + w, y1 + h)

  test("Mbb intersects is symmetric and union contains both operands") {
    check("sym", Prop.forAll(mbbGen, mbbGen) { (a, b) =>
      a.intersects(b) == b.intersects(a)
    })
    check("union", Prop.forAll(mbbGen, mbbGen) { (a, b) =>
      val u = a.union(b)
      u.contains(a) && u.contains(b)
    })
    check("contains-implies-intersects", Prop.forAll(mbbGen, mbbGen) { (a, b) =>
      !a.contains(b) || a.intersects(b)
    })
  }

  test("hilbert value is injective over distinct grid cells (order 8)") {
    val order = 8
    val cell = Gen.chooseNum(0L, (1L << order) - 1)
    check("injective", Prop.forAll(cell, cell, cell, cell) { (x1, y1, x2, y2) =>
      val same = (x1 == x2) && (y1 == y2)
      val d1 = HilbertValue.xy2d(order, x1, y1)
      val d2 = HilbertValue.xy2d(order, x2, y2)
      (d1 == d2) == same
    })
    check("range", Prop.forAll(cell, cell) { (x, y) =>
      val d = HilbertValue.xy2d(order, x, y)
      d >= 0 && d < (1L << (2 * order))
    })
  }

  test("hilbert locality: adjacent cells are close on the curve on average") {
    // not a per-pair guarantee (Hilbert has jumps), but the mean step for
    // +1-x neighbors must be far below random ordering's mean distance
    val order = 8
    val n = 1L << order
    val rnd = new scala.util.Random(13)
    val steps = (1 to 2000).map { _ =>
      val x = rnd.nextInt(n.toInt - 1).toLong; val y = rnd.nextInt(n.toInt).toLong
      math.abs(HilbertValue.xy2d(order, x, y) - HilbertValue.xy2d(order, x + 1, y))
    }
    val mean = steps.sum.toDouble / steps.length
    assert(mean < (n * n) / 100.0, s"mean hilbert step $mean too large")
  }

  test("TileIndex.covering: every in-space point has an owner, ids preserved") {
    val tileGen = for {
      id <- Gen.chooseNum(0, 10000)
      m <- mbbGen
    } yield TileBoundary(id, m)
    val tilesGen = Gen.nonEmptyListOf(tileGen)
      .map(_.groupBy(_.tileId).map(_._2.head).toList) // unique ids
    val space = Mbb(-1000, -1000, 1100, 1100)
    check("coverage", Prop.forAll(tilesGen, coord, coord) { (tiles, x, y) =>
      val idx = new TileIndex(tiles.toArray, space)
      val owner = idx.refTile(x, y)
      owner >= 0 && {
        val ids = tiles.map(_.tileId).toSet
        tiles.forall(t => idx.tiles.exists(p => p.tileId == t.tileId && p.mbb == t.mbb))
      }
    })
  }

  test("haversine: symmetric, zero at identity, positive otherwise") {
    val lon = Gen.chooseNum(-179.0, 179.0); val lat = Gen.chooseNum(-89.0, 89.0)
    check("sym", Prop.forAll(lon, lat, lon, lat) { (a, b, c, d) =>
      Geo.haversineMeters(a, b, c, d) == Geo.haversineMeters(c, d, a, b)
    })
    check("identity", Prop.forAll(lon, lat) { (a, b) =>
      Geo.haversineMeters(a, b, a, b) == 0.0
    })
  }

  test("RemoveCoveredTokens kernel == split-based reference on adversarial inputs") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    // texts with empty tokens (leading/trailing/double spaces) included
    val textGen = Gen.listOfN(14,
      Gen.oneOf("a", "bb", "", "c")).map(_.mkString(" "))
    val kGen = Gen.chooseNum(1, 4)
    check("reference", Prop.forAll(textGen, kGen,
        Gen.listOf(Gen.chooseNum(0, 16))) { (s, k, starts) =>
      val kernel = graft.functions.RemoveCoveredTokens(
        Literal("x"), Literal("y"), k)
      val got = Option(kernel.compute(UTF8String.fromString(s),
        new GenericArrayData(starts.toArray))).map(_.toString)
      val toks = s.split(" ", -1)
      val covered = starts.flatMap(p => p until p + k).toSet
      val surv = toks.zipWithIndex.collect {
        case (t, i) if !covered(i) => t
      }
      val want = if (surv.isEmpty) None else Some(surv.mkString(" "))
      got == want
    })
  }

  test("BpeEncode: token stream always re-concatenates to the pretoken stream") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val textGen = Gen.listOfN(12, Gen.oneOf(
      "the", "then", "123", "!!", " ", "é", "'ll")).map(_.mkString)
    val symGen = Gen.oneOf("t", "h", "e", "th", "he", "1", "2", "!", " ")
    val mergesGen = Gen.listOfN(6, Gen.zip(symGen, symGen))
    check("preserves-content", Prop.forAll(textGen, mergesGen) { (s, merges) =>
      val enc = graft.functions.BpeEncode(Literal("x"), merges)
      val toks = enc.encode(UTF8String.fromString(s))
      val joined = (0 until toks.numElements())
        .map(i => toks.getUTF8String(i).toString).mkString
      val pretokens = graft.text.TextFunctions.BpePretokenPattern.r
        .findAllMatchIn(s).map(_.group(1)).mkString
      joined == pretokens
    })
  }
}
