package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Job-level attribution for one gate: `runMain graft.JobProbe <gate>
  * [--sf=<dir>]` — warmup at sf0.001, then one timed run printing every
  * JOB with wall time, description, and the DRIVER-SIDE GAP since the
  * previous job ended. Where [[StageProbe]] attributes wall to plan
  * pieces, this attributes it to the spaces BETWEEN jobs (query planning,
  * streaming-lifecycle machinery, checkpoint WAL, driver loops) — the
  * streaming gates' dominant term per the round-16 audit. */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val (flags, names) = args.partition(_.startsWith("--sf="))
    val sfDir = flags.headOption.map(_.stripPrefix("--sf="))
      .getOrElse("/root/testdata/sf0.1")
    require(names.length == 1, "usage: JobProbe <query name> [--sf=<dir>]")
    val spark = Sessions.localBuilder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(names.head)
    fn(spark, "/root/testdata/sf0.001").count()
    val t0 = new java.util.concurrent.atomic.AtomicLong(0L)
    val lastEnd = new java.util.concurrent.atomic.AtomicLong(0L)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        starts.put(js.jobId, (js.time, desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.get(je.jobId)).foreach { case (st, desc) =>
          val base = t0.get()
          val prev = lastEnd.getAndUpdate(e => math.max(e, je.time))
          val gap = (st - math.max(prev, base)) / 1e3
          println(f"[job] ${je.jobId}%4d +${(st - base) / 1e3}%7.3f " +
            f"gap=${math.max(0.0, gap)}%6.3f wall=${(je.time - st) / 1e3}%6.3f  " +
            desc.take(110))
        }
      }
    })
    println(s"=== timed $sfDir ===")
    System.gc()
    val n0 = System.nanoTime()
    t0.set(System.currentTimeMillis()); lastEnd.set(t0.get())
    fn(spark, sfDir).count()
    println(f"[total] ${(System.nanoTime() - n0) / 1e9}%.2f s")
    // listener bus is async — give the tail of the job log a moment to drain
    Thread.sleep(300)
    spark.stop()
  }
}
