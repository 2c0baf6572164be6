package graft.ann

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ContextOrderSpec extends SparkTestBase {
  import spark.implicits._

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("chain matches an independent driver greedy reference") {
    // one cell (single centroid), six vectors with distinct pairwise cosines
    val items = Seq(
      (1L, vec(1, 0, 0)), (2L, vec(0.9, 0.1, 0)), (3L, vec(0, 1, 0)),
      (4L, vec(0.1, 0.9, 0)), (5L, vec(0, 0, 1)), (6L, vec(0.1, 0, 0.9)))
      .toDF("id", "v")
    val model = IvfIndex.Model(Array(Array(1.0, 1.0, 1.0)))
    val got = ContextOrder.orderByContext(items, "id", "v", model)
      .orderBy("chain_pos").select("id").as[Long].collect().toSeq

    // driver reference: same greedy rule, independent implementation
    val vs = Map(1L -> vec(1, 0, 0), 2L -> vec(0.9, 0.1, 0), 3L -> vec(0, 1, 0),
       4L -> vec(0.1, 0.9, 0), 5L -> vec(0, 0, 1), 6L -> vec(0.1, 0, 0.9))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) *
             math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val chain = scala.collection.mutable.ArrayBuffer(1L)
    while (chain.size < vs.size) {
      val cur = vs(chain.last)
      val next = vs.keys.filterNot(chain.contains)
        .minBy(id => (-cos(cur, vs(id)), id))
      chain += next
    }
    assert(got == chain.toSeq, s"expected $chain, got $got")
    // geometric sanity: the similar pairs are adjacent
    def adjacent(a: Long, b: Long) = math.abs(got.indexOf(a) - got.indexOf(b)) == 1
    assert(adjacent(1L, 2L) && adjacent(3L, 4L) && adjacent(5L, 6L))
  }

  test("positions are a 1..m permutation per cell; null vectors land in cell -1") {
    val items = (0 until 120).map { i =>
      val v = if (i % 17 == 0) null
        else vec(math.cos(i * 0.3), math.sin(i * 0.3), (i % 7) * 0.1)
      (i.toLong, v)
    }.toDF("id", "v")
    val model = IvfIndex.Model(Array(
      Array(1.0, 0.0, 0.0), Array(-1.0, 0.0, 0.0),
      Array(0.0, 1.0, 0.0), Array(0.0, -1.0, 0.0)))
    val got = ContextOrder.orderByContext(items, "id", "v", model)
    assert(got.count() == 120, "every row keeps exactly one position")
    val perCell = got.groupBy("cell")
      .agg(count(lit(1)).as("n"), min("chain_pos").as("lo"),
        max("chain_pos").as("hi"), countDistinct("chain_pos").as("d"))
      .as[(Int, Long, Int, Int, Long)].collect()
    perCell.foreach { case (cell, n, lo, hi, d) =>
      assert(lo == 1 && hi == n && d == n, s"cell $cell positions not 1..$n")
    }
    val nullCell = got.where(col("cell") === -1)
      .orderBy("chain_pos").select("id").as[Long].collect()
    assert(nullCell.toSeq == (0 until 120).filter(_ % 17 == 0).map(_.toLong),
      "null vectors must keep id order in cell -1")
  }

  test("NaN-component and zero vectors keep the 1..m permutation per cell") {
    // NaN components: NaN centroid distances beat nothing, so assignment
    // routes the vector to the -1 quarantine cell with the nulls (the
    // crash this pins: nearestCentroids(...).head on the empty result);
    // zero vectors assign normally but have no cosine direction — the
    // chain's fallback appends them in id order instead of duplicating
    // the current id and dropping them
    val items = Seq(
      (0L, vec(Double.NaN, 0, 0)), (1L, vec(1, 0, 0)), (2L, vec(0.9, 0.1, 0)),
      (3L, vec(0, 0, 0)), (4L, vec(0.8, 0.2, 0)))
      .toDF("id", "v")
    val model = IvfIndex.Model(Array(Array(1.0, 0.0, 0.0)))
    val got = ContextOrder.orderByContext(items, "id", "v", model)
      .select("id", "cell", "chain_pos").as[(Long, Int, Int)].collect()
    assert(got.map(_._1).sorted.toSeq == (0L to 4L),
      s"every id exactly once, got ${got.toSeq}")
    assert(got.find(_._1 == 0L).get._2 == -1,
      "NaN vector must land in the -1 quarantine cell")
    val cell0 = got.filter(_._2 >= 0).sortBy(_._3)
    assert(cell0.map(_._3).toSeq == (1 to 4), "cell positions must be 1..m")
    assert(cell0.map(_._1).toSeq == Seq(1L, 2L, 4L, 3L),
      s"similar vectors chain first, the zero vector appends: ${cell0.toSeq}")
  }

  test("ordering improves adjacent-pair cosine vs id order; maxChain blocks bound the walk") {
    val rnd = new scala.util.Random(7)
    // 3 latent topics; ids interleaved so id-order adjacency is cross-topic
    val bases: Array[Array[Double]] = Array(
      Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0), Array(0.0, 0.0, 1.0))
    val items = (0 until 90).map { i =>
      val base = bases(i % 3)
      (i.toLong, base.map(x => (x + rnd.nextGaussian() * 0.05).toFloat))
    }.toDF("id", "v")
    val model = IvfIndex.Model(Array(Array(0.5, 0.5, 0.5)))
    def meanAdjCos(ordered: Seq[Long], vs: Map[Long, Array[Float]]): Double =
      ordered.sliding(2).map { case Seq(a, b) =>
        ContextOrder.cosine(vs(a), vs(b))
      }.sum / (ordered.size - 1)
    val vs = items.as[(Long, Array[Float])].collect().toMap
    for (mc <- Seq(4096, 30)) {
      val ordered = ContextOrder.orderByContext(items, "id", "v", model, maxChain = mc)
        .orderBy("chain_pos").select("id").as[Long].collect().toSeq
      assert(ordered.sorted == (0L until 90L),
        "chain must be a permutation")
      val gain = meanAdjCos(ordered, vs) - meanAdjCos((0L until 90L), vs)
      assert(gain > 0.3,
        s"maxChain=$mc: similarity-chained layout must beat id order (gain=$gain)")
    }
  }
}
