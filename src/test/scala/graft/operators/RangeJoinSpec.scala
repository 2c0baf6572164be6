package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def naive(points: DataFrame, intervals: DataFrame): Set[(Long, Long)] =
    points.join(intervals,
        points("v") >= intervals("lo") && points("v") <= intervals("hi"))
      .select(points("pid"), intervals("iid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def bucketed(points: DataFrame, intervals: DataFrame,
                       width: Option[Long] = None,
                       wideFactor: Int = 32): Set[(Long, Long)] =
    RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi",
        bucketWidth = width, wideFactor = wideFactor)
      .select(col("pid"), col("r_iid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  // deterministic mixed-length interval set: mostly short, some medium,
  // a few domain-spanning (the wide lane), plus inverted ones that must drop
  private def mkIntervals(n: Int): DataFrame =
    (0 until n).map { i =>
      val lo = (i.toLong * 2654435761L) % 100000L
      val len = i % 10 match {
        case 9 => 40000L // wide outlier
        case 8 => 500L
        case _ => i % 7 + 1L
      }
      if (i % 31 == 0) (i.toLong, lo, lo - 5) // inverted → drops
      else (i.toLong, lo, lo + len)
    }.toDF("iid", "lo", "hi")

  private def mkPoints(n: Int): DataFrame =
    (0 until n).map(i => (i.toLong, (i.toLong * 40503L) % 100000L))
      .toDF("pid", "v")

  test("matches the naive nested-loop join exactly (mixed lengths)") {
    val pts = mkPoints(2000)
    val ivs = mkIntervals(500)
    val want = naive(pts, ivs.where($"lo" <= $"hi"))
    assert(bucketed(pts, ivs) == want)
    // explicit narrow width forces heavy replication — same result
    assert(bucketed(pts, ivs, width = Some(16L)) == want)
    // tiny wideFactor pushes most intervals to the broadcast lane — same
    assert(bucketed(pts, ivs, wideFactor = 1) == want)
  }

  test("a point inside k overlapping intervals emits k rows (not deduped)") {
    val pts = Seq((1L, 50L)).toDF("pid", "v")
    val ivs = Seq((1L, 0L, 100L), (2L, 40L, 60L), (3L, 50L, 50L))
      .toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, "v", ivs, "lo", "hi",
      bucketWidth = Some(10L))
    assert(got.count() == 3)
  }

  test("negative domains bucket correctly (floor, not truncate)") {
    val pts = Seq((1L, -105L), (2L, -5L), (3L, 5L)).toDF("pid", "v")
    val ivs = Seq((1L, -110L, -100L), (2L, -10L, 10L)).toDF("iid", "lo", "hi")
    val got = bucketed(pts, ivs, width = Some(10L))
    assert(got == Set((1L, 1L), (2L, 2L), (3L, 2L)))
  }

  test("maxWide guards a degenerate all-wide input") {
    val pts = mkPoints(10)
    val ivs = (0 until 50).map(i => (i.toLong, 0L, 1000000L))
      .toDF("iid", "lo", "hi")
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(pts, "v", ivs, "lo", "hi",
        bucketWidth = Some(10L), maxWide = 5).count()
    }
  }

  test("output name collisions are rejected") {
    val pts = Seq((1L, 5L, "x")).toDF("pid", "v", "r_iid")
    val ivs = Seq((1L, 0L, 10L)).toDF("iid", "lo", "hi")
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(pts, "v", ivs, "lo", "hi")
    }
  }

  private def naiveOverlap(a: DataFrame, b: DataFrame): Set[(Long, Long)] =
    a.join(b, greatest(a("lo"), b("lo2")) <= least(a("hi"), b("hi2")))
      .select(a("aid"), b("bid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def mkSide(n: Int, seed: Long, loName: String, hiName: String,
                     idName: String): DataFrame =
    (0 until n).map { i =>
      val lo = ((i.toLong + seed) * 2654435761L) % 50000L
      val len = i % 10 match {
        case 9 => 20000L
        case 8 => 300L
        case _ => i % 6 + 1L
      }
      (i.toLong, lo, lo + len)
    }.toDF(idName, loName, hiName)

  test("intervalOverlap matches the naive join (both-side wide lanes)") {
    val a = mkSide(400, 0, "lo", "hi", "aid")
    val b = mkSide(300, 7, "lo2", "hi2", "bid")
    val want = naiveOverlap(a, b)
    def got(width: Option[Long], wf: Int): Set[(Long, Long)] =
      RangeJoin.intervalOverlap(a, "lo", "hi", b, "lo2", "hi2",
          bucketWidth = width, wideFactor = wf)
        .select(col("aid"), col("r_bid"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got(None, 32) == want)
    assert(got(Some(8L), 32) == want)   // heavy replication both sides
    assert(got(Some(64L), 2) == want)   // most rows through wide lanes
  }

  test("intervalOverlap emits each overlapping pair exactly once") {
    // two long intervals sharing MANY buckets — refpoint dedup must
    // collapse the bucket-lane duplicates to one row
    val a = Seq((1L, 0L, 1000L)).toDF("aid", "lo", "hi")
    val b = Seq((2L, 500L, 1500L)).toDF("bid", "lo2", "hi2")
    val got = RangeJoin.intervalOverlap(a, "lo", "hi", b, "lo2", "hi2",
      bucketWidth = Some(10L), wideFactor = 1000)
    assert(got.count() == 1)
  }

  test("bucket lane plans as a hash equi-join, not nested-loop") {
    val pts = mkPoints(200)
    val ivs = mkIntervals(100).where($"hi" - $"lo" < 100) // narrow only
    val out = RangeJoin.pointInInterval(pts, "v", ivs, "lo", "hi",
      bucketWidth = Some(8L))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"narrow lane fell back to nested-loop:\n$plan")
  }
}
