package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions._

/** The reference's output-projection mini-language (P1 —
  * resque_params_2d.hpp:70-160 `set_projection_param`, field extraction
  * resque_2d.cpp:437-490): a comma list of
  *
  *   `1:K` / `2:K`  — K-th column (1-based) of the left / right join side
  *   `tileid`       — owning tile id (engine metadata; here: constant -1
  *                    placeholder unless a tile column is present)
  *   `area1|area2`  — polygon area of a side's geometry
  *   `union|intersect|jaccard|dice|mindist` — pair measures
  *
  * applied to a joined DataFrame whose sides were prefixed `l_`/`r_`
  * (as produced by [[graft.operators.SpatialJoin.selfJoin]]) or to explicit
  * column lists. Dependencies (jaccard needs union+intersect in the
  * reference's lazy-flag machinery, resque_params_2d.hpp:149-159) are free
  * here: Catalyst prunes and shares subexpressions.
  */
object Fields {

  def parse(spec: String, leftCols: Seq[String], rightCols: Seq[String],
            leftGeom: String, rightGeom: String,
            tileCol: Option[String] = None): Seq[Column] = {
    val lg = col(leftGeom); val rg = col(rightGeom)
    spec.split(",").map(_.trim).filter(_.nonEmpty).toSeq.map {
      case s if s.startsWith("1:") =>
        val k = s.drop(2).toInt
        require(k >= 1 && k <= leftCols.length, s"field $s out of range")
        col(leftCols(k - 1))
      case s if s.startsWith("2:") =>
        val k = s.drop(2).toInt
        require(k >= 1 && k <= rightCols.length, s"field $s out of range")
        col(rightCols(k - 1))
      // the owning tile id (resque_2d.cpp:448) when the joined frame carries
      // one (join with keepTile=true); -1 otherwise, like an untiled plan
      case "tileid"    =>
        tileCol.map(c => col(c).as("tileid")).getOrElse(lit(-1).as("tileid"))
      case "area1"     => st_area(lg).as("area1")
      case "area2"     => st_area(rg).as("area2")
      case "union"     => st_union_area(lg, rg).as("union_area")
      case "intersect" => st_intersection_area(lg, rg).as("intersect_area")
      case "jaccard"   => st_jaccard(lg, rg).as("jaccard")
      case "dice"      => st_dice(lg, rg).as("dice")
      case "mindist"   => st_distance(lg, rg).as("mindist")
      case other => throw new IllegalArgumentException(s"unknown field '$other'")
    }
  }

  /** Apply a spec to a selfJoin/join output with l_/r_ prefixed columns.
    * `tileid` resolves to the frame's `tile_id` column when present
    * (produced by Config(keepTile = true)). */
  def project(joined: DataFrame, spec: String,
              leftGeom: String = "l_geom", rightGeom: String = "r_geom"): DataFrame = {
    val lCols = joined.columns.filter(_.startsWith("l_")).toSeq
    val rCols = joined.columns.filter(_.startsWith("r_")).toSeq
    val tileCol = if (joined.columns.contains("tile_id")) Some("tile_id") else None
    joined.select(parse(spec, lCols, rCols, leftGeom, rightGeom, tileCol): _*)
  }
}
