package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import java.nio.file.Files

class ZoneMapSpec extends SparkTestBase {
  import spark.implicits._
  import ZoneMap.ZoneRange

  private def tmp(name: String): String =
    Files.createTempDirectory(s"zonemap_$name").toString + "/store"

  // 10k rows, two independent numeric dims + a null-key stripe
  private lazy val data = spark.range(10000).select(
      $"id",
      when($"id" % 100 === 99, lit(null)).otherwise($"id" % 500).as("k"),
      (($"id" * 2654435761L) % 1000).cast("double").as("v"),
      concat(lit("p"), $"id").as("payload"))
    .cache()

  test("pruned read is bit-identical to the unpruned filter") {
    val path = tmp("parity")
    ZoneMap.writeClustered(data, path, Seq("k"), numFiles = 8)
    val ranges = Seq(ZoneRange("k", 120L, 180L))
    val pruned = ZoneMap.readPruned(spark, path, ranges)
      .select("id", "k", "v", "payload").collect().toSet
    val full = spark.read.parquet(path)
      .where($"k".between(120, 180))
      .select("id", "k", "v", "payload").collect().toSet
    assert(pruned == full)
    assert(pruned.nonEmpty)
    // null-k rows never match a range
    assert(!pruned.exists(_.isNullAt(1)))
  }

  test("range clustering prunes files on the leading column") {
    val path = tmp("prune")
    ZoneMap.writeClustered(data, path, Seq("k"), numFiles = 8)
    val st = ZoneMap.pruneStats(spark, path, Seq(ZoneRange("k", 0L, 60L)))
    assert(st.totalFiles >= 6, s"expected ~8 files, got ${st.totalFiles}")
    assert(st.selectedFiles < st.totalFiles,
      s"narrow range should skip files: $st")
  }

  test("hilbert pair clustering prunes on BOTH dimensions") {
    val path = tmp("hilbert")
    val noNull = data.where($"k".isNotNull)
    ZoneMap.writeClustered(noNull, path, Seq("k", "v"), numFiles = 16,
      hilbertPair = true)
    val onK = ZoneMap.pruneStats(spark, path, Seq(ZoneRange("k", 0L, 50L)))
    val onV = ZoneMap.pruneStats(spark, path, Seq(ZoneRange("v", 0.0, 100.0)))
    assert(onK.selectedFiles < onK.totalFiles, s"k-range should prune: $onK")
    assert(onV.selectedFiles < onV.totalFiles, s"v-range should prune: $onV")
    // and the 2-D read is still exact
    val ranges = Seq(ZoneRange("k", 100L, 240L), ZoneRange("v", 200.0, 600.0))
    val pruned = ZoneMap.readPruned(spark, path, ranges)
      .select("id").as[Long].collect().toSet
    val full = noNull.where($"k".between(100, 240) && $"v".between(200.0, 600.0))
      .select("id").as[Long].collect().toSet
    assert(pruned == full && pruned.nonEmpty)
  }

  test("manifest is invisible to a plain read; schema round-trips") {
    val path = tmp("hidden")
    ZoneMap.writeClustered(data, path, Seq("k"), numFiles = 4)
    val back = spark.read.parquet(path)
    assert(back.count() == data.count())
    assert(back.schema.fieldNames.sorted.toSeq ==
      data.schema.fieldNames.sorted.toSeq)
  }

  test("appendClustered: reads stay exact across appends; manifest covers every file") {
    val path = tmp("append")
    ZoneMap.writeClustered(data.where($"id" < 4000), path, Seq("k"), numFiles = 4)
    ZoneMap.appendClustered(data.where($"id" >= 4000 && $"id" < 7000),
      path, Seq("k"), numFiles = 4)
    ZoneMap.appendClustered(data.where($"id" >= 7000), path, Seq("k"), numFiles = 4)
    // full content survives
    assert(spark.read.parquet(path).count() == data.count())
    // manifest: one row per data file, every file covered
    val st = ZoneMap.pruneStats(spark, path,
      Seq(ZoneMap.ZoneRange("k", Long.MinValue, Long.MaxValue)))
    assert(st.totalFiles == 12 && st.selectedFiles == 12)
    // pruned read spanning all three appends is still bit-exact
    val ranges = Seq(ZoneMap.ZoneRange("k", 120L, 180L))
    val pruned = ZoneMap.readPruned(spark, path, ranges)
      .select("id", "k", "v", "payload").collect().toSet
    val full = spark.read.parquet(path).where($"k".between(120, 180))
      .select("id", "k", "v", "payload").collect().toSet
    assert(pruned == full && pruned.nonEmpty)
    // each append clusters independently, so the range still skips files
    val narrow = ZoneMap.pruneStats(spark, path, ranges)
    assert(narrow.selectedFiles < narrow.totalFiles)
  }

  test("empty inputs: write fails loudly, append is a no-op") {
    val path = tmp("emptyIn")
    val none = data.where($"id" < 0)
    intercept[IllegalArgumentException] {
      ZoneMap.writeClustered(none, path, Seq("k"), numFiles = 4)
    }
    ZoneMap.writeClustered(data.where($"id" < 100), path, Seq("k"), numFiles = 2)
    ZoneMap.appendClustered(none, path, Seq("k"), numFiles = 2) // no-op
    assert(spark.read.parquet(path).count() == 100)
    val st = ZoneMap.pruneStats(spark, path,
      Seq(ZoneMap.ZoneRange("k", Long.MinValue, Long.MaxValue)))
    assert(st.totalFiles == 2)
  }

  test("appendClustered to an empty path is the initial write") {
    val path = tmp("appendInit")
    ZoneMap.appendClustered(data, path, Seq("k"), numFiles = 4)
    val st = ZoneMap.pruneStats(spark, path,
      Seq(ZoneMap.ZoneRange("k", 0L, 499L)))
    assert(st.totalFiles == 4)
    assert(spark.read.parquet(path).count() == data.count())
  }

  test("optimize: re-clusters a fragmented store, restores pruning, keeps bits") {
    val path = tmp("optimize")
    // three overlapping-span appends: every batch covers the whole k
    // domain, so a narrow range must touch a file from each batch
    ZoneMap.writeClustered(data.where($"id" % 3 === 0), path, Seq("k"), numFiles = 4)
    ZoneMap.appendClustered(data.where($"id" % 3 === 1), path, Seq("k"), numFiles = 4)
    ZoneMap.appendClustered(data.where($"id" % 3 === 2), path, Seq("k"), numFiles = 4)
    val ranges = Seq(ZoneRange("k", 120L, 180L))
    val before = ZoneMap.readPruned(spark, path, ranges)
      .select("id", "k", "v", "payload").collect().toSet
    val fragmented = ZoneMap.pruneStats(spark, path, ranges)
    assert(fragmented.totalFiles == 12 && fragmented.selectedFiles >= 3,
      s"overlapping appends should dilute pruning: $fragmented")
    val st = ZoneMap.optimize(spark, path, Seq("k"), numFiles = 4)
    assert(st.filesBefore == 12 && st.filesAfter <= 4, s"unexpected $st")
    // bit-parity with the pre-optimize pruned read
    val after = ZoneMap.readPruned(spark, path, ranges)
      .select("id", "k", "v", "payload").collect().toSet
    assert(after == before && after.nonEmpty)
    // global clustering restored: the narrow range now touches one file
    val opt = ZoneMap.pruneStats(spark, path, ranges)
    // ~125 k-units per file: a 61-unit range touches at most 2 adjacent
    // files (boundary straddle), strictly fewer than the fragmented store
    assert(opt.totalFiles == st.filesAfter && opt.selectedFiles <= 2 &&
      opt.selectedFiles < fragmented.selectedFiles,
      s"optimize should restore near-single-file pruning: $opt")
    // no stale generation left behind
    assert(spark.read.parquet(path).count() == data.count())
  }

  test("optimize absorbs unmanifested files (the append crash window heals)") {
    val path = tmp("optimizeHeal")
    ZoneMap.writeClustered(data.where($"id" < 9000), path, Seq("k"), numFiles = 4)
    // simulate a crashed append: data files land, manifest rows don't
    data.where($"id" >= 9000).coalesce(1).write.mode("append").parquet(path)
    val all = Seq(ZoneRange("k", Long.MinValue, Long.MaxValue))
    assert(ZoneMap.readPruned(spark, path, all).count() < data.count(),
      "unmanifested files must be invisible to pruned reads")
    ZoneMap.optimize(spark, path, Seq("k"), numFiles = 4)
    assert(ZoneMap.readPruned(spark, path, all).count() ==
      data.where($"k".isNotNull).count(),
      "optimize must fold unmanifested rows back into the governed store")
    intercept[IllegalArgumentException] {
      ZoneMap.optimize(spark, tmp("optimizeNone"), Seq("k"), numFiles = 4)
    }
  }

  test("crashed optimize: recovery rolls back orphans, re-run never duplicates") {
    import org.apache.hadoop.fs.Path
    val path = tmp("optCrashBack")
    ZoneMap.writeClustered(data, path, Seq("k"), numFiles = 4)
    val all = Seq(ZoneRange("k", Long.MinValue, Long.MaxValue))
    val want = ZoneMap.readPruned(spark, path, all)
      .select("id", "k", "v", "payload").collect().toSet
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash before the manifest swap: marker up + an orphan new-gen file
    fs.create(new Path(path, "_zm_opt_inflight"), true).close()
    val aData = fs.listStatus(new Path(path)).filter(s => s.isFile &&
      !s.getPath.getName.startsWith("_")).head.getPath
    org.apache.hadoop.fs.FileUtil.copy(fs, aData, fs,
      new Path(path, "part-orphan-newgen.parquet"), false,
      spark.sparkContext.hadoopConfiguration)
    // appends must refuse while the marker is up
    intercept[IllegalArgumentException] {
      ZoneMap.appendClustered(data.limit(5), path, Seq("k"), numFiles = 1)
    }
    assert(ZoneMap.recoverOptimize(spark, path), "recovery should act")
    assert(!fs.exists(new Path(path, "_zm_opt_inflight")))
    assert(ZoneMap.readPruned(spark, path, all)
      .select("id", "k", "v", "payload").collect().toSet == want,
      "roll-back must restore exactly the pre-optimize store")
    // a full optimize after recovery has no duplicates
    ZoneMap.optimize(spark, path, Seq("k"), numFiles = 4)
    assert(ZoneMap.readPruned(spark, path, all)
      .select("id", "k", "v", "payload").collect().toSet == want)
    assert(!ZoneMap.recoverOptimize(spark, path), "no marker → no-op")
  }

  test("crashed optimize: a committed newer generation rolls forward") {
    import org.apache.hadoop.fs.Path
    val path = tmp("optCrashFwd")
    ZoneMap.writeClustered(data, path, Seq("k"), numFiles = 4)
    val all = Seq(ZoneRange("k", Long.MinValue, Long.MaxValue))
    val want = ZoneMap.readPruned(spark, path, all)
      .select("id", "k", "v", "payload").collect().toSet
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a crash right after the new generation committed: marker
    // up, the manifest lives at _zonemap_g1 (committed, with _SUCCESS),
    // generation 0 already gone
    fs.create(new Path(path, "_zm_opt_inflight"), true).close()
    assert(fs.rename(new Path(path, "_zonemap"), new Path(path, "_zonemap_g1")))
    assert(ZoneMap.recoverOptimize(spark, path))
    assert(fs.exists(new Path(path, "_zonemap_g1")))
    assert(ZoneMap.readPruned(spark, path, all)
      .select("id", "k", "v", "payload").collect().toSet == want,
      "roll-forward must leave the new generation governing the same rows")
    // a PARTIAL newer generation (no _SUCCESS) is discarded instead
    fs.create(new Path(path, "_zm_opt_inflight"), true).close()
    fs.mkdirs(new Path(path, "_zonemap_g2"))
    fs.create(new Path(path, "_zonemap_g2/part-junk.parquet"), true).close()
    assert(ZoneMap.recoverOptimize(spark, path))
    assert(!fs.exists(new Path(path, "_zonemap_g2")))
    assert(fs.exists(new Path(path, "_zonemap_g1")))
    assert(ZoneMap.readPruned(spark, path, all)
      .select("id", "k", "v", "payload").collect().toSet == want)
  }

  test("a read interleaved with every optimize protocol state sees exactly one generation") {
    import org.apache.hadoop.fs.Path
    val path = tmp("optStates")
    ZoneMap.writeClustered(data, path, Seq("k"), numFiles = 4)
    val all = Seq(ZoneRange("k", Long.MinValue, Long.MaxValue))
    val want = ZoneMap.readPruned(spark, path, all)
      .select("id", "k", "v", "payload").collect().toSet
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def readNow(state: String): Unit = {
      val got = ZoneMap.readPruned(spark, path, all)
        .select("id", "k", "v", "payload").collect().toSet
      assert(got == want, s"state [$state]: read must see exactly one " +
        s"complete generation (got ${got.size} rows, want ${want.size})")
    }
    val oldFiles = fs.listStatus(new Path(path)).filter(s => s.isFile &&
      !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
      .map(_.getPath).toSeq

    // S1: marker up, new layout clustering into the hidden tmp
    fs.create(new Path(path, "_zm_opt_inflight"), true).close()
    val tmpDir = s"$path/_zm_opt_tmp"
    spark.read.parquet(oldFiles.map(_.toString): _*)
      .repartition(2).write.mode("overwrite").parquet(tmpDir)
    readNow("S1 marker+tmp")

    // S2: new generation's data files moved into the root (unreferenced
    // by the governing manifest -> invisible)
    val moved = fs.listStatus(new Path(tmpDir)).toSeq.filter(s => s.isFile &&
      !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
      .map { s =>
        val dst = new Path(path, s"g1-${s.getPath.getName}")
        assert(fs.rename(s.getPath, dst)); dst.toString
      }
    fs.delete(new Path(tmpDir), true)
    readNow("S2 new files in root")

    // S2b: the next generation's manifest is being written (no _SUCCESS
    // yet) -> still invisible, generation 0 governs
    spark.read.parquet(moved: _*)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("cnt"), min($"k").as("min_k"), max($"k").as("max_k"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_zonemap_g1")
    fs.delete(new Path(path, "_zonemap_g1/_SUCCESS"), false)
    readNow("S2b partial new manifest (no _SUCCESS)")

    // S3: new generation COMMITTED (with _SUCCESS), generation 0 and its
    // files still present -> the new generation governs, rows once
    fs.create(new Path(path, "_zonemap_g1/_SUCCESS"), true).close()
    readNow("S3 both generations on disk")

    // S4: old manifest deleted
    fs.delete(new Path(path, "_zonemap"), true)
    readNow("S4 old manifest gone")

    // S5: old data files deleted, marker down
    oldFiles.foreach(f => fs.delete(f, false))
    fs.delete(new Path(path, "_zm_opt_inflight"), false)
    readNow("S5 clean new generation")

    // recovery on any of these states is idempotent about the result:
    // re-raise the marker at S5 and recover -> same rows, one generation
    fs.create(new Path(path, "_zm_opt_inflight"), true).close()
    assert(ZoneMap.recoverOptimize(spark, path))
    readNow("post-recovery")
    // and a full optimize afterwards still governs the same rows
    ZoneMap.optimize(spark, path, Seq("k"), numFiles = 4)
    readNow("post-optimize")
  }

  test("optimize keeps hilbert-pair stores prunable on both dimensions") {
    val path = tmp("optimizeHc")
    ZoneMap.writeClustered(data.where($"id" < 5000), path, Seq("k", "v"),
      numFiles = 8, hilbertPair = true)
    ZoneMap.appendClustered(data.where($"id" >= 5000), path, Seq("k", "v"),
      numFiles = 8, hilbertPair = true)
    ZoneMap.optimize(spark, path, Seq("k", "v"), numFiles = 8, hilbertPair = true)
    val byK = ZoneMap.pruneStats(spark, path, Seq(ZoneRange("k", 0L, 50L)))
    val byV = ZoneMap.pruneStats(spark, path, Seq(ZoneRange("v", 0.0, 100.0)))
    assert(byK.selectedFiles < byK.totalFiles, s"k should prune: $byK")
    assert(byV.selectedFiles < byV.totalFiles, s"v should prune: $byV")
    val got = ZoneMap.readPruned(spark, path, Seq(ZoneRange("k", 0L, 50L)))
      .agg(sum($"id")).head().getLong(0)
    val want = data.where($"k".between(0, 50)).agg(sum($"id")).head().getLong(0)
    assert(got == want)
  }

  test("a pinned read absorbs two interleaved optimize cycles; the retry budget is bounded") {
    val path = tmp("race")
    ZoneMap.writeClustered(data, path, Seq("k"), numFiles = 8)
    val ranges = Seq(ZoneRange("k", 120L, 180L))
    val want = ZoneMap.readPruned(spark, path, ranges)
      .select("id", "k", "v", "payload").collect().toSet

    // TWO full optimize cycles land inside the read's resolve→collect
    // window, back to back: each invalidates the generation the (re)read
    // just pinned. The retry budget (3) must absorb both and land on the
    // final committed generation with identical rows.
    var cycles = 0
    ZoneMap.testAfterResolve = () => {
      if (cycles < 2) {
        cycles += 1
        ZoneMap.optimize(spark, path, Seq("k"), numFiles = 4)
      }
    }
    try {
      val got = ZoneMap.readPruned(spark, path, ranges)
        .select("id", "k", "v", "payload").collect().toSet
      assert(cycles == 2, "both racing optimizes must have run")
      assert(got == want)
    } finally ZoneMap.testAfterResolve = () => ()

    // pathological tight-loop optimizer: more racing cycles than the
    // budget → loud IllegalStateException, not an unbounded spin or a raw
    // FileNotFoundException
    ZoneMap.testAfterResolve =
      () => ZoneMap.optimize(spark, path, Seq("k"), numFiles = 4)
    try {
      val e = intercept[IllegalStateException] {
        ZoneMap.readPruned(spark, path, ranges)
      }
      assert(e.getMessage.contains("optimize"), e.getMessage)
    } finally ZoneMap.testAfterResolve = () => ()

    // the store itself is untouched by the failed read
    val after = ZoneMap.readPruned(spark, path, ranges)
      .select("id", "k", "v", "payload").collect().toSet
    assert(after == want)
  }

  test("disjoint range selects zero files and returns an empty, schema-true frame") {
    val path = tmp("empty")
    ZoneMap.writeClustered(data, path, Seq("k"), numFiles = 4)
    val st = ZoneMap.pruneStats(spark, path, Seq(ZoneRange("k", 10000L, 20000L)))
    assert(st.selectedFiles == 0)
    val out = ZoneMap.readPruned(spark, path, Seq(ZoneRange("k", 10000L, 20000L)))
    assert(out.count() == 0)
    assert(out.schema.fieldNames.sorted.toSeq ==
      data.schema.fieldNames.sorted.toSeq)
  }
}
