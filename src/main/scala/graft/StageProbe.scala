package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Stage-level hot-spot prober for one gate: `runMain graft.StageProbe
  * q_dedup_ngram [--sf=<dir>]` — warmup at sf0.001, then one timed run
  * printing every stage over 150 ms with task counts, record flow and cpu
  * time, for attributing a gate's wall time to its plan pieces. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val (flags, names) = args.partition(_.startsWith("--sf="))
    val sfDir = flags.headOption.map(_.stripPrefix("--sf="))
      .getOrElse("/root/testdata/sf0.1")
    require(names.length == 1, "usage: StageProbe <query name> [--sf=<dir>]")
    val spark = Sessions.localBuilder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(names.head)
    fn(spark, "/root/testdata/sf0.001").count()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (si.completionTime.get - si.submissionTime.get) / 1e3
        if (dur > 0.15) {
          val m = si.taskMetrics
          println(f"[stage] ${si.stageId}%4d ${dur}%6.2f s tasks=${si.numTasks}%3d " +
            f"in=${m.inputMetrics.recordsRead}%9d shR=${m.shuffleReadMetrics.recordsRead}%9d " +
            f"shW=${m.shuffleWriteMetrics.recordsWritten}%9d cpu=${m.executorRunTime / 1000.0}%7.1f")
        }
      }
    })
    println(s"=== timed $sfDir ===")
    System.gc()
    val t0 = System.nanoTime()
    fn(spark, sfDir).count()
    println(f"[total] ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
