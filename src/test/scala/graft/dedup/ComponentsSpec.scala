package graft.dedup

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Connected components (large-star/small-star) vs driver union-find. */
class ComponentsSpec extends SparkTestBase {
  import spark.implicits._

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  test("random graphs match union-find (sparse, dense, chains, empty)") {
    val rnd = new Random(11)
    val cases = Seq(
      (50, Seq.empty[(Long, Long)]),                                   // all singletons
      (60, (0L until 59L).map(i => (i, i + 1))),                       // one long chain
      (80, Seq.fill(40)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))), // sparse
      (40, Seq.fill(200)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))) // dense
    )
    cases.foreach { case (n, edges) =>
      val nodes = (0L until n.toLong).toDF("id")
      val e = edges.toDF("a", "b")
      val want = unionFind(n, edges.filter(t => t._1 != t._2))
      // driver union-find path (default threshold) and the distributed
      // star-contraction path (threshold 0) must agree exactly
      Seq(Components.DriverEdgeThreshold, 0).foreach { thr =>
        val got = Components.connectedComponents(nodes, "id", e, "a", "b",
            driverThreshold = thr)
          .as[(Long, Long)].collect().toMap
        assert(got == want, s"n=$n edges=${edges.size} thr=$thr")
      }
    }
  }

  test("long chain converges within the O(log n) iteration budget") {
    // label propagation would need ~512 rounds here; star contraction ~10
    val n = 512L
    val nodes = (0L until n).toDF("id")
    val e = (0L until n - 1).map(i => (i, i + 1)).toDF("a", "b")
    val got = Components.connectedComponents(nodes, "id", e, "a", "b",
        maxIter = 15, driverThreshold = 0)
      .as[(Long, Long)].collect()
    assert(got.forall(_._2 == 0L) && got.length == n)
  }

  test("reliable-checkpoint mode (cluster path) matches local-checkpoint rounds") {
    // the executor-loss-resilient path a real cluster runs: rounds go
    // through sc.checkpoint into the checkpoint dir instead of
    // localCheckpoint blocks — same star-contraction structure, same labels
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt")
    val hadCkpt = spark.sparkContext.getCheckpointDir
    spark.sparkContext.setCheckpointDir(dir.toString)
    spark.conf.set("spark.graft.components.checkpoint", "reliable")
    try {
      val rnd = new Random(7)
      val n = 70
      val edges = Seq.fill(60)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(t => t._1 != t._2)
      val nodes = (0L until n.toLong).toDF("id")
      val got = Components.connectedComponents(nodes, "id",
          edges.toDF("a", "b"), "a", "b", driverThreshold = 0)
        .as[(Long, Long)].collect().toMap
      assert(got == unionFind(n, edges))
      // the rounds really went through the reliable path: checkpoint files
      // exist under the dir
      def anyFile(f: java.io.File): Boolean =
        f.isFile || Option(f.listFiles()).exists(_.exists(anyFile))
      assert(anyFile(dir.toFile), "no reliable checkpoint files written")
      // misconfiguration screams instead of silently running local
      spark.conf.set("spark.graft.components.checkpoint", "bogus")
      intercept[IllegalArgumentException] {
        Components.connectedComponents(nodes, "id",
          edges.toDF("a", "b"), "a", "b", driverThreshold = 0)
      }
    } finally {
      // the checkpoint dir cannot be UNset on a live SparkContext — pin the
      // rest of this suite to the local mode so `auto` never routes later
      // tests into the (deleted) temp dir
      spark.conf.set("spark.graft.components.checkpoint", "local")
      hadCkpt.foreach(spark.sparkContext.setCheckpointDir)
      org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
    }
  }

  test("null edge endpoints are ignored on both paths") {
    val nodes = (0L until 6L).toDF("id")
    val e = Seq((Some(1L), Some(2L)), (Some(3L), None), (None, None))
      .toDF("a", "b")
    Seq(Components.DriverEdgeThreshold, 0).foreach { thr =>
      val got = Components.connectedComponents(nodes, "id", e, "a", "b",
          driverThreshold = thr)
        .as[(Long, Long)].collect().toMap
      assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L, 5L -> 5L),
        s"thr=$thr")
    }
  }

  test("dedupByComponents keeps exactly the min-id row per cluster") {
    val df = Seq((1L, "a"), (2L, "a2"), (3L, "b"), (4L, "c"), (5L, "c2"), (6L, "c3"))
      .toDF("id", "payload")
    val e = Seq((2L, 1L), (5L, 4L), (6L, 5L)).toDF("x", "y")
    val kept = Components.dedupByComponents(df, "id", e, "x", "y")
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L))
  }

  test("dedupByComponentsRanked keeps the best-scoring member; score ties fall to min id") {
    // cluster {1,2}: 2 has the higher score -> 2 survives (min-id would keep 1)
    // cluster {4,5,6}: 4 and 6 tie at the top score -> min id 4 survives
    // isolated 3 always survives
    val df = Seq((1L, 10L), (2L, 20L), (3L, 1L), (4L, 7L), (5L, 3L), (6L, 7L))
      .toDF("id", "score")
    val e = Seq((2L, 1L), (5L, 4L), (6L, 5L)).toDF("x", "y")
    val kept = Components.dedupByComponentsRanked(df, "id", "score", e, "x", "y")
      .select("id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L, 4L))
    // all input columns survive the selection (all-column-preserving)
    assert(Components.dedupByComponentsRanked(df, "id", "score", e, "x", "y")
      .columns.toSet == Set("id", "score"))
  }

  test("dedupByComponents: ghost edge endpoint can't steal a cluster's survivor") {
    // edges reference id 0, which is NOT a row of df and is the component
    // minimum — the survivor must still be the smallest REAL row (1), and
    // ghost-mediated transitive connectivity (1-0-2) must still merge
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "payload")
    val e = Seq((0L, 1L), (0L, 2L)).toDF("x", "y")
    val kept = Components.dedupByComponents(df, "id", e, "x", "y")
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
  }
}
