package graft.viz

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.api._
import graft.core.{GeometryCodec, Mbb, TileBoundary}
import graft.functions.st_geomfromwkt

/** Partition visualizer (reference src/visualizer/partition_vis.cpp). */
class PartitionVisSpec extends SparkTestBase {
  import spark.implicits._

  private def boxes = {
    val rnd = new scala.util.Random(7)
    (0 until 400).map { i =>
      val x = rnd.nextDouble() * 100; val y = rnd.nextDouble() * 100
      (i.toLong, s"POLYGON(($x $y,${x + 2} $y,${x + 2} ${y + 2},$x ${y + 2},$x $y))")
    }.toDF("id", "wkt").withColumn("geom", st_geomfromwkt(col("wkt")))
  }

  test("tileFrame counts agree with describeSpatialPartitioning and keep empty tiles") {
    val df = boxes
    val tf = PartitionVis.tileFrame(df, "geom", "fg", 50).cache()
    val perTile = df.describeSpatialPartitioning("geom", "fg", 50)._1
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val viz = tf.collect().map(r => r.getInt(0) -> r.getLong(5)).toMap
    // every populated tile matches; tiles absent from the stats frame are 0
    assert(viz.filter(_._2 > 0) == perTile)
    assert(viz.keySet.size >= perTile.size)
    // boundaries are sane, tile ids unique, space covered
    val rows = tf.collect()
    assert(rows.map(_.getInt(0)).distinct.length == rows.length)
    rows.foreach { r =>
      assert(r.getDouble(1) < r.getDouble(3) && r.getDouble(2) < r.getDouble(4))
    }
    tf.unpersist()
  }

  test("gnuplot script has reference shape: header, tile rects, object rects, plot line") {
    val tiles = Seq(TileBoundary(0, Mbb(0, 0, 5, 5)), TileBoundary(1, Mbb(5, 0, 10, 5)))
    val objs = Seq(Mbb(1, 1, 2, 2))
    val script = PartitionVis.gnuplotScript(tiles, Mbb(0, 0, 10, 5), "out.png", objs)
    val lines = script.linesIterator.toSeq
    assert(lines.take(3) == Seq("reset", "unset tics", "set term png"))
    assert(lines(3) == "set output \"out.png\"")
    // tile rects: numbered from 1, fs empty border <2..6> lw 2
    assert(lines(4).startsWith("set object 1 rect from 0.0,0.0 to 5.0,5.0 fs empty border "))
    assert(lines(4).endsWith("lw 2") && lines(5).endsWith("lw 2"))
    val colors = Seq(lines(4), lines(5)).map(_.split("border ")(1).split(" ")(0).toInt)
    assert(colors.forall(c => c >= 2 && c <= 6))
    // object rects follow with black border 1 lw 1
    assert(lines(6) == "set object 3 rect from 1.0,1.0 to 2.0,2.0 fs empty border 1 lw 1")
    assert(lines.last == "plot [0.0:10.0] [0.0:5.0] NaN notitle")
  }

  test("writeScript emits a parseable script over planned tiles, deterministically") {
    val dir = Files.createTempDirectory("graft_viz").toString
    val path = s"$dir/part.plt"
    val n1 = PartitionVis.writeScript(boxes, path, s"$dir/part.png",
      partitioner = "fg", bucket = 50, maxObjects = 20)
    val s1 = new String(Files.readAllBytes(Paths.get(path)))
    val n2 = PartitionVis.writeScript(boxes, path, s"$dir/part.png",
      partitioner = "fg", bucket = 50, maxObjects = 20)
    val s2 = new String(Files.readAllBytes(Paths.get(path)))
    assert(s1 == s2 && n1 == n2) // seeded sample + tile_id colors => reproducible
    assert(s1.linesIterator.count(_.startsWith("set object")) == n1)
    assert(s1.linesIterator.toSeq.last.startsWith("plot ["))
    // every partitioner produces a renderable script whose tile rects
    // cover all 400 objects (covering() pads sample-derived tilings)
    Seq("fg", "bsp", "qt", "str", "hc", "slc", "bos").foreach { p =>
      val n3 = PartitionVis.writeScript(boxes, s"$dir/$p.plt", s"$dir/$p.png",
        partitioner = p, bucket = 50)
      assert(n3 > 0, p)
      val tf = PartitionVis.tileFrame(boxes, "geom", p, 50)
      val total = tf.agg(sum("n_objects")).head().getLong(0)
      assert(total >= 400, s"$p replicated count $total < object count")
    }
  }
}
