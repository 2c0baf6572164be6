package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Static range join: points against closed intervals (`lo <= pt <= hi`)
  * over an integer domain — the IP→ASN / value-in-band lookup class.
  *
  * Spark plans a bare `p JOIN i ON p.v BETWEEN i.lo AND i.hi` as a
  * (broadcast) nested-loop join — O(points × intervals) comparisons, which
  * is exactly the plan that dies first at scale. This operator makes the
  * join keyed: the value domain is cut into fixed-width buckets, each
  * interval is replicated to the buckets it overlaps, each point maps to
  * exactly ONE bucket, and the join becomes a hash equi-join on bucket
  * followed by the exact BETWEEN post-filter. Because a point lives in one
  * bucket, no dedup pass is needed — each (point, interval) match is
  * produced exactly once.
  *
  * Skew containment is two-lane, the 1-D twin of the spatial join's
  * hot-tile handling: an interval spanning many buckets would replicate
  * that many times, so intervals longer than `wideFactor` buckets leave
  * the bucket lane and join through a broadcast BETWEEN lane instead.
  * Under any length distribution the bucket lane replicates each interval
  * ≤ `wideFactor`+1 times, and the broadcast lane carries only the rare
  * domain-spanning outliers (default-route rows, /8 blocks) — small by
  * construction in lookup tables, and `require`-guarded by `maxWide` so a
  * degenerate input fails loudly rather than silently broadcasting
  * gigabytes.
  *
  * Bucket width defaults to ~2× the MEDIAN interval length (one
  * approx-quantile pass over interval metadata only). Width affects only
  * performance, never results — the BETWEEN post-filter is exact — so the
  * estimate being approximate is harmless.
  *
  * Output: every `points` column, then every `intervals` column prefixed
  * with `rightPrefix` (collision-checked, same contract as
  * [[AsofJoin]]). Inner join: points matching no interval drop; a point
  * inside k overlapping intervals emits k rows.
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, ptCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      bucketWidth: Option[Long] = None,
                      wideFactor: Int = 32,
                      maxWide: Long = 2000000L,
                      rightPrefix: String = "r_"): DataFrame = {
    require(wideFactor >= 1, "wideFactor must be >= 1")
    val ptNames = points.columns.toSeq
    val outRight = intervals.columns.toSeq.map(rightPrefix + _)
    val clashes = outRight.intersect(ptNames)
    require(clashes.isEmpty,
      s"rangeJoin output name collision: ${clashes.mkString(", ")} — " +
        s"pick a rightPrefix disjoint from the point columns")

    // permissive-input policy (matches the geometry codec): inverted
    // intervals carry no containable value and drop here
    val iv = intervals.where(col(loCol) <= col(hiCol))

    val width = math.max(1L, bucketWidth.getOrElse {
      // 2x median length: a typical interval then overlaps 1-2 buckets
      val q = iv.select((col(hiCol) - col(loCol) + 1).cast("double").as("len"))
        .stat.approxQuantile("len", Array(0.5), 0.01)
      if (q.isEmpty) 1L else math.max(1L, (2 * q(0)).toLong)
    })

    // bucket key = the bucket's LOWER BOUNDARY, not its index: v − pmod(v,w)
    // is exact long arithmetic at any magnitude (a long division through
    // double would lose precision past 2^53) and floors correctly for
    // negative values (pmod is non-negative)
    def bucketOf(v: org.apache.spark.sql.Column) = v - pmod(v, lit(width))

    val prefixed = iv.columns.foldLeft(iv) { (d, c) =>
      d.withColumnRenamed(c, rightPrefix + c)
    }
    val (rLo, rHi) = (col(rightPrefix + loCol), col(rightPrefix + hiCol))
    val spanBytes = bucketOf(rHi) - bucketOf(rLo) // = (buckets−1)·width
    val narrow = prefixed.where(spanBytes < wideFactor.toLong * width)
    val wide = prefixed.where(spanBytes >= wideFactor.toLong * width)

    val between = col(ptCol) >= rLo && col(ptCol) <= rHi

    // bucket lane: intervals replicate to every overlapped bucket, points
    // map to exactly one bucket — a plain hash equi-join + exact filter
    val narrowRep = narrow.withColumn("__b",
      explode(sequence(bucketOf(rLo), bucketOf(rHi), lit(width))))
    val bucketLane = points.withColumn("__b", bucketOf(col(ptCol)))
      .join(narrowRep, Seq("__b")).where(between).drop("__b")

    // broadcast lane: the few domain-spanning intervals
    val nWide =
      wide.limit(math.min(maxWide + 1, Int.MaxValue.toLong).toInt).count()
    require(nWide <= maxWide,
      s"rangeJoin wide lane exceeds maxWide=$maxWide intervals (> " +
        s"$wideFactor buckets each at width=$width) — raise bucketWidth " +
        s"or maxWide; a broadcast this large needs an explicit opt-in")
    val out =
      if (nWide == 0) bucketLane
      else bucketLane.unionByName(points.join(broadcast(wide), between))
    out.select((ptNames ++ outRight).map(col): _*)
  }

  /** Interval×interval overlap join: closed intervals overlap iff
    * `max(aLo,bLo) <= min(aHi,bHi)` — the temporal-overlap /
    * reservation-conflict class. Same bucket machinery as
    * [[pointInInterval]], but BOTH sides replicate, so a pair sharing k
    * buckets would surface k times; the REFERENCE-POINT rule (the 1-D twin
    * of the spatial join's tile dedup) emits each pair only in the single
    * bucket containing `max(aLo,bLo)` — the overlap's start, which lies
    * inside both intervals, so both replicas are present exactly there.
    *
    * Wide intervals (≥ `wideFactor` buckets) on either side leave the
    * bucket lane: wide-right broadcasts against ALL of left, wide-left
    * broadcasts against narrow-right only (wide×wide already lands in the
    * first broadcast lane), each lane `maxWide`-guarded. Output: every
    * left column, then every right column prefixed (collision-checked).
    * A pair overlapping in k ways still emits once per (row, row) pair —
    * multiplicity comes from rows, never from buckets. */
  def intervalOverlap(left: DataFrame, lLoCol: String, lHiCol: String,
                      right: DataFrame, rLoCol: String, rHiCol: String,
                      bucketWidth: Option[Long] = None,
                      wideFactor: Int = 32,
                      maxWide: Long = 2000000L,
                      rightPrefix: String = "r_"): DataFrame = {
    require(wideFactor >= 1, "wideFactor must be >= 1")
    val lNames = left.columns.toSeq
    val outRight = right.columns.toSeq.map(rightPrefix + _)
    val clashes = (outRight :+ "__b").intersect(lNames)
    require(clashes.isEmpty,
      s"intervalOverlap output name collision: ${clashes.mkString(", ")} — " +
        s"pick a rightPrefix disjoint from the left columns")

    val lv = left.where(col(lLoCol) <= col(lHiCol))
    val rv = right.where(col(rLoCol) <= col(rHiCol))

    val width = math.max(1L, bucketWidth.getOrElse {
      val q = lv.select((col(lHiCol) - col(lLoCol) + 1).cast("double").as("len"))
        .unionByName(
          rv.select((col(rHiCol) - col(rLoCol) + 1).cast("double").as("len")))
        .stat.approxQuantile("len", Array(0.5), 0.01)
      if (q.isEmpty) 1L else math.max(1L, (2 * q(0)).toLong)
    })
    def bucketOf(v: org.apache.spark.sql.Column) = v - pmod(v, lit(width))
    val wideSpan = wideFactor.toLong * width

    val rvp = rv.columns.foldLeft(rv) { (d, c) =>
      d.withColumnRenamed(c, rightPrefix + c)
    }
    val (rLo, rHi) = (col(rightPrefix + rLoCol), col(rightPrefix + rHiCol))
    val (lLo, lHi) = (col(lLoCol), col(lHiCol))
    val overlap = greatest(lLo, rLo) <= least(lHi, rHi)

    val narrowL = lv.where(bucketOf(lHi) - bucketOf(lLo) < wideSpan)
    val wideL = lv.where(bucketOf(lHi) - bucketOf(lLo) >= wideSpan)
    val narrowR = rvp.where(bucketOf(rHi) - bucketOf(rLo) < wideSpan)
    val wideR = rvp.where(bucketOf(rHi) - bucketOf(rLo) >= wideSpan)

    def guard(side: String, d: DataFrame): Long = {
      val n = d.limit(math.min(maxWide + 1, Int.MaxValue.toLong).toInt).count()
      require(n <= maxWide,
        s"intervalOverlap $side wide lane exceeds maxWide=$maxWide " +
          s"intervals (>= $wideFactor buckets each at width=$width) — " +
          s"raise bucketWidth or maxWide")
      n
    }
    val nWideL = guard("left", wideL)
    val nWideR = guard("right", wideR)

    // bucket lane: both sides replicate; the reference-point filter keeps
    // each overlapping pair only in the bucket of max(aLo, bLo)
    val repL = narrowL.withColumn("__b",
      explode(sequence(bucketOf(lLo), bucketOf(lHi), lit(width))))
    val repR = narrowR.withColumn("__b",
      explode(sequence(bucketOf(rLo), bucketOf(rHi), lit(width))))
    val bucketLane = repL.join(repR, Seq("__b"))
      .where(overlap && bucketOf(greatest(lLo, rLo)) === col("__b"))
      .drop("__b")

    var out = bucketLane
    if (nWideR > 0) out = out.unionByName(lv.join(broadcast(wideR), overlap))
    if (nWideL > 0)
      out = out.unionByName(
        narrowR.join(broadcast(wideL), overlap)
          .select((lNames ++ outRight).map(col): _*))
    out.select((lNames ++ outRight).map(col): _*)
  }
}
