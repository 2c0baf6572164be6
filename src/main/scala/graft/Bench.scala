package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen warmup on the smallest SF so the timed loop measures
    // steady-state engine throughput, not first-touch compilation.
    SparkEntry.queries.foreach { case (_, fn) =>
      try { fn(spark, "/root/testdata/sf0.001").count() }
      catch { case _: Throwable => () }
    }
    // min-of-3 per query: the host is shared and single runs jitter 2-6x
    // (the round-5 record carried an 18 s corpus_clean against a 2.6 s
    // steady state from a single loaded window — best-of-2 wasn't enough).
    // A GC between timings keeps one query's garbage from being charged to
    // the next (the round-3 q_knn "regression" was exactly this).
    def once(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      System.gc()
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val runs = Seq(once(fn), once(fn), once(fn))
      name -> (if (runs.exists(_ < 0)) -1.0 else runs.min)
    }
    val (failed, ok) = results.partition(_._2 < 0)
    // failed queries carry null, not -1: tooling that sums or diffs the
    // per-query map against prior rounds must not absorb sentinel values —
    // the separate "failed" list is the failure signal
    // times rounded to ms: full double precision is noise and bloats the
    // one-line record past the driver's tail-capture budget (the r7 record
    // lost 13 gates to front-truncation)
    def r3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) =>
      s"\"" + k + "\":" + (if (v < 0) "null" else r3(v))
    }.mkString("{", ",", "}")
    // a failed query must scream, not silently shrink the headline: the
    // total sums successes only, failures are listed separately
    val failedList = failed.keys.map(k => s"\"$k\"").mkString("[", ",", "]")
    val total = if (ok.nonEmpty) ok.values.sum else 0.0
    // 1-min load average at end of run: a skewed record (r5 corpus_clean
    // 18.3 s, r7 12.07 s — both host-load artifacts) is self-documenting.
    val load = try {
      java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    } catch { case _: Throwable => -1.0 }
    if (failed.nonEmpty) {
      System.err.println("!" * 72)
      System.err.println(s"[bench] GATES FAILED: ${failed.keys.mkString(", ")}")
      System.err.println("!" * 72)
    }
    val line = s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"failed":$failedList,"load1m":${r3(load)},"sf":"$sfDir"}"""
    println(line)
    // the driver keeps only the LAST ~2.2 KB of stdout, which truncated
    // the FRONT (headline fields) of the r7-r9 records — print a compact
    // summary AFTER the full line so whatever survives tail-capture always
    // carries the totals; the full per-query map is persisted below
    println(s"""{"metric":"total_compact","value":${r3(total)},"unit":"sec","n":${results.size},"n_failed":${failed.size},"failed":$failedList,"load1m":${r3(load)},"sf":"$sfDir"}""")
    // the driver's tail-capture truncated the r7/r8 records (last ~2.2 KB
    // of stdout survive; the one-line record now exceeds that); persist the
    // full line so every timed gate survives in a committed artifact
    // regardless of how much stdout the driver keeps. Path is relative to
    // the working directory (overridable) so a different checkout location
    // still gets the safeguard, and a write failure says so instead of
    // silently dropping it.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "tools/bench_last.json")
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outPath),
        (line + "\n").getBytes("UTF-8"))
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] WARNING: could not persist $outPath: $e")
    }
    spark.stop()
  }
}
