package graft

import org.apache.spark.sql.SparkSession

/** Local min-of-3 prober for individual gates: `runMain graft.PlanProbe
  * q_knn_3d q_knn_3d_oc [--sf /root/testdata/sf0.1]` — the per-query form
  * of Bench's protocol (warmup at sf0.001, System.gc between timings),
  * for iterating on one operator without paying the full bench sweep. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val (flags, names) = args.partition(_.startsWith("--sf="))
    val sfDir = flags.headOption.map(_.stripPrefix("--sf="))
      .getOrElse("/root/testdata/sf0.1")
    require(names.nonEmpty, "usage: PlanProbe <query names...> [--sf=<dir>]")
    val spark = Sessions.localBuilder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = SparkEntry.queries
    names.foreach { n =>
      require(e.contains(n), s"unknown query $n; known: ${e.keys.toSeq.sorted.mkString(", ")}")
    }
    names.foreach(n => e(n)(spark, "/root/testdata/sf0.001").count())
    names.foreach { n =>
      val times = (1 to 3).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        e(n)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[min3] $n%-26s min=${times.min}%.2f  runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
