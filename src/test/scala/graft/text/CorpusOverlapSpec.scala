package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class CorpusOverlapSpec extends SparkTestBase {
  import spark.implicits._

  private def keys(rows: (Long, Seq[Long])*) =
    rows.toSeq.toDF("id", "ks")
      .select(col("id"), explode(col("ks")).as("k"))

  test("report: coverage, deterministic top pair, zero-hit and null lanes") {
    // A1: 4 keys, 3 hit by eval (2 from B10, 2 from B20 — one shared key
    //     appears in both); top pair ties at 2 shared -> min bid wins
    // A2: 2 keys, none hit
    // A3: 5 keys, 4 hit, all from B20
    val a = keys(1L -> Seq(101, 102, 103, 104),
                 2L -> Seq(201, 202),
                 3L -> Seq(301, 302, 303, 304, 305))
    val b = keys(10L -> Seq(101, 102, 999),
                 20L -> Seq(102, 103, 301, 302, 303, 304))
      .withColumnRenamed("id", "bid")
    val got = CorpusOverlap.report(a, "id", b, "bid", "k", minShared = 2)
      .collect().map(r => r.getLong(0) -> r).toMap

    val r1 = got(1L)
    assert(r1.getLong(1) == 4 && r1.getLong(2) == 3)      // na, n_hit_keys
    assert(r1.getLong(3) == 750000L)                      // hit_micro
    assert(r1.getLong(4) == 10L && r1.getLong(5) == 2L)   // tie -> min bid
    assert(r1.getLong(6) == 500000L)                      // top_micro

    val r2 = got(2L)
    assert(r2.getLong(1) == 2 && r2.getLong(2) == 0 && r2.getLong(3) == 0)
    assert(r2.isNullAt(4) && r2.getLong(5) == 0 && r2.getLong(6) == 0)

    val r3 = got(3L)
    assert(r3.getLong(2) == 4 && r3.getLong(4) == 20L && r3.getLong(5) == 4L)
    assert(r3.getLong(3) == 800000L && r3.getLong(6) == 800000L)
  }

  test("minShared drops sub-floor pairs from attribution but not from coverage") {
    val a = keys(1L -> Seq(1, 2, 3))
    val b = keys(10L -> Seq(1L)).withColumnRenamed("id", "bid")
    val r = CorpusOverlap.report(a, "id", b, "bid", "k", minShared = 2)
      .collect().head
    assert(r.getLong(2) == 1 && r.getLong(3) == 333333L) // coverage counted
    assert(r.isNullAt(4) && r.getLong(5) == 0)           // pair suppressed
  }

  test("report matches a brute-force reference on seeded random corpora") {
    for (seed <- Seq(7L, 42L, 1337L)) {
      val rnd = new scala.util.Random(seed)
      val aDocs = (1L to 60L).map(i =>
        i -> Seq.fill(1 + rnd.nextInt(12))(rnd.nextInt(40).toLong).distinct)
      val bDocs = (101L to 110L).map(i =>
        i -> Seq.fill(1 + rnd.nextInt(8))(rnd.nextInt(40).toLong).distinct)
      val minShared = 1 + rnd.nextInt(3)

      val got = CorpusOverlap.report(
          keys(aDocs: _*), "id",
          keys(bDocs: _*).withColumnRenamed("id", "bid"), "bid", "k",
          minShared)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)),
          r.getLong(5), r.getLong(6))).toMap

      val bAll = bDocs.flatMap(_._2).toSet
      val want = aDocs.map { case (aid, ks) =>
        val na = ks.length.toLong
        val nHit = ks.count(bAll.contains).toLong
        val pairs = bDocs.map { case (bid, bs) =>
          (bid, ks.count(bs.toSet.contains).toLong) }
          .filter(_._2 >= minShared)
        val top = pairs.sortBy { case (bid, sh) => (-sh, bid) }.headOption
        aid -> ((na, nHit, math.floorDiv(nHit * 1000000L, na),
          top.map(_._1), top.map(_._2).getOrElse(0L),
          math.floorDiv(top.map(_._2).getOrElse(0L) * 1000000L, na)))
      }.toMap
      assert(got == want, s"seed=$seed minShared=$minShared")
    }
  }

  test("eval side is broadcast: the training relation never shuffles into the hit join") {
    val a = keys(1L -> Seq(1, 2, 3), 2L -> Seq(4, 5))
    val b = keys(10L -> Seq(1, 4)).withColumnRenamed("id", "bid")
    val plan = CorpusOverlap.report(a, "id", b, "bid", "k")
      .queryExecution.executedPlan
    val hasBcastJoin = plan.toString.contains("BroadcastHashJoin")
    assert(hasBcastJoin, s"expected a broadcast hit join in:\n$plan")
  }
}
