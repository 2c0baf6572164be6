package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** CorpusDiff snapshot deltas + CorpusSplit.assignSplitsByCluster
  * (leakage-safe splits) — the two corpus-refresh-discipline operators. */
class CorpusDiffSpec extends SparkTestBase {
  import spark.implicits._

  test("diff labels added/removed/changed/unchanged exactly") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("doc_id", "text")
    val nw = Seq((2L, "b"), (3L, "C2"), (4L, "d"), (9L, "new"))
      .toDF("doc_id", "text")
    val got = CorpusDiff.diff(old, nw, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "unchanged", 9L -> "added"))
  }

  test("diffAgainstKeys matches diff — old corpus never needed") {
    val old = (0L until 200L).map(i => (i, s"doc $i body ${i % 7}"))
      .toDF("doc_id", "text")
    val nw = (50L until 250L).map(i =>
      (i, if (i % 11 == 0) s"doc $i REVISED" else s"doc $i body ${i % 7}"))
      .toDF("doc_id", "text")
    val viaKeys = CorpusDiff.diffAgainstKeys(nw, "doc_id", "text",
        CorpusDiff.snapshotKeys(old, "doc_id", "text"))
      .as[(Long, String)].collect().toSet
    val direct = CorpusDiff.diff(old, nw, "doc_id", "text")
      .as[(Long, String)].collect().toSet
    assert(viaKeys == direct && viaKeys.size == 250)
  }

  test("changedOrNew emits exactly the refresh input rows") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val nw = Seq((2L, "b"), (3L, "c3"), (7L, "n")).toDF("doc_id", "text")
    val got = CorpusDiff.changedOrNew(nw, "doc_id", "text",
        CorpusDiff.snapshotKeys(old, "doc_id", "text"))
      .as[(Long, String)].collect().toSet
    assert(got == Set((3L, "c3"), (7L, "n")))
  }

  test("null texts: null==null is unchanged, null-vs-present is changed") {
    val old = Seq((1L, null: String), (2L, "x"), (3L, null: String))
      .toDF("doc_id", "text")
    val nw = Seq((1L, null: String), (2L, null: String), (3L, "y"))
      .toDF("doc_id", "text")
    val got = CorpusDiff.diff(old, nw, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "changed"))
  }

  test("cluster split never separates a near-dup pair") {
    val docs = (0L until 300L).map(i => (i, s"text ${i % 300}"))
      .toDF("doc_id", "text")
    // chain edges inside groups of 3: {0,1,2},{3,4,5},... must co-split
    val edges = (0L until 300L).filter(_ % 3 != 2)
      .map(i => (i, i + 1)).toDF("ida", "idb")
    val split = CorpusSplit.assignSplitsByCluster(docs, "doc_id",
        edges, "ida", "idb", Seq(("train", 0.8), ("valid", 0.1), ("test", 0.1)))
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    edges.as[(Long, Long)].collect().foreach { case (a, b) =>
      assert(split(a) == split(b), s"edge ($a,$b) crosses splits")
    }
    // all three splits populated (100 clusters over an 80/10/10 hash)
    assert(split.values.toSet == Set("train", "valid", "test"))
    // deterministic under repartition
    val again = CorpusSplit.assignSplitsByCluster(docs.repartition(7),
        "doc_id", edges.repartition(3), "ida", "idb",
        Seq(("train", 0.8), ("valid", 0.1), ("test", 0.1)))
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(again == split)
  }
}
