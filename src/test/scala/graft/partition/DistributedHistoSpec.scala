package graft.partition

import scala.util.Random

import graft.SparkTestBase
import graft.core.Mbb

class DistributedHistoSpec extends SparkTestBase {
  import spark.implicits._

  private val space = Mbb(0, 0, 100, 50)
  private val N = 1 << DistributedHisto.Depth

  test("allHistograms: fused single-pass tables == per-table reference") {
    val rnd = new Random(7)
    val mbbs = Array.fill(2000) {
      val cx = if (rnd.nextDouble() < 0.6) 5 + rnd.nextDouble() * 8
               else rnd.nextDouble() * 100
      val cy = rnd.nextDouble() * 50
      val w = rnd.nextDouble() * 2; val h = rnd.nextDouble() * 2
      Mbb(math.max(0, cx - w), math.max(0, cy - h),
          math.min(100, cx + w), math.min(50, cy + h))
    }
    val df = mbbs.toSeq.map(m => (m.xmin, m.ymin, m.xmax, m.ymax))
      .toDF("xmin", "ymin", "xmax", "ymax")

    val (counts, cross) = DistributedHisto.allHistograms(df, space)

    // reference: the original per-table aggregate for counts, plus
    // driver-side construction of the four marginals
    val refCounts = DistributedHisto.histogram(df, space)
    assert(counts == refCounts)

    val w = space.width / N; val h = space.height / N
    def cell(v: Double, lo: Double, wd: Double): Int =
      math.max(0, math.min(N - 1, math.floor((v - lo) / wd).toInt))
    def tab(center: Mbb => Double, edge: Mbb => Double, lo: Double, wd: Double) = {
      val t = Array.ofDim[Long](N, N)
      mbbs.foreach(m => t(cell(center(m), lo, wd))(cell(edge(m), lo, wd)) += 1)
      t
    }
    def eq(a: Array[Array[Long]], b: Array[Array[Long]]): Boolean =
      a.zip(b).forall { case (ra, rb) => ra.sameElements(rb) }
    assert(eq(cross.xs, tab(_.centerX, _.xmin, space.xmin, w)))
    assert(eq(cross.xe, tab(_.centerX, _.xmax, space.xmin, w)))
    assert(eq(cross.ys, tab(_.centerY, _.ymin, space.ymin, h)))
    assert(eq(cross.ye, tab(_.centerY, _.ymax, space.ymin, h)))
  }

  test("sort-based distributed partitioners refuse unbounded tile plans") {
    // an undersized bucket over a huge relation must fail fast with the
    // sizing knob in the message, BEFORE the full-relation planning sort
    val df = Seq((0.0, 0.0, 1.0, 1.0)).toDF("xmin", "ymin", "xmax", "ymax")
    val hugeN = 100000000000L // 1e11 rows, bucket 1 -> 1e11 tiles
    for ((name, run) <- Seq[(String, () => Any)](
        "str_dist" -> (() => DistributedStr.tiles(df, hugeN, 1)),
        "slc_dist" -> (() => DistributedSlc.tiles(df, space, hugeN, 1)),
        "hc_dist" -> (() => DistributedHilbert.tiles(df, space, hugeN, 1)))) {
      val e = intercept[IllegalArgumentException](run())
      assert(e.getMessage.contains(name) &&
        e.getMessage.contains("Raise Config.bucket"),
        s"$name: diagnostic must name the partitioner and the knob; got: ${e.getMessage}")
    }
    // and a sane bucket still plans
    assert(DistributedStr.tiles(df, 1L, 10).nonEmpty)
  }
}
