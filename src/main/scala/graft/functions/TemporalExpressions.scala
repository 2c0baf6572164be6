package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Multi-interval temporal predicates — the reference's spatio-temporal
  * extension (/root/reference/src/extensions/spt/temporal_functions.hpp:9-111,
  * temporal.h:4-24): an object carries a list of [start,end] intervals.
  *
  * Column type: ArrayType(Struct(start: Long, end: Long)).
  *
  * NOTE the reference's inner loop has an index bug (`i++` on the outer
  * index at temporal_functions.hpp:77) — these implementations follow the
  * documented intent, not the bug (SURVEY F9).
  */
object TemporalExpressions {
  val IntervalType: StructType = StructType(Seq(
    StructField("start", LongType, nullable = false),
    StructField("end", LongType, nullable = false)))
  val IntervalsType: ArrayType = ArrayType(IntervalType)

  def intervals(a: Any): Array[(Long, Long)] = {
    val arr = a.asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements()) { i =>
      val s = arr.getStruct(i, 2)
      (s.getLong(0), s.getLong(1))
    }
  }
}

/** True iff any interval of `left` overlaps any interval of `right`
  * (closed intervals: a.start <= b.end && b.start <= a.end). */
case class IntervalsOverlap(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] =
    Seq(TemporalExpressions.IntervalsType, TemporalExpressions.IntervalsType)
  override def dataType: DataType = BooleanType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = TemporalExpressions.intervals(a)
    val ys = TemporalExpressions.intervals(b)
    xs.exists { case (s1, e1) => ys.exists { case (s2, e2) => s1 <= e2 && s2 <= e1 } }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
  override def prettyName: String = "intervals_overlap"
}

/** True iff every interval of `right` lies inside some interval of `left`. */
case class IntervalsContain(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] =
    Seq(TemporalExpressions.IntervalsType, TemporalExpressions.IntervalsType)
  override def dataType: DataType = BooleanType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = TemporalExpressions.intervals(a)
    val ys = TemporalExpressions.intervals(b)
    ys.nonEmpty && ys.forall { case (s2, e2) =>
      xs.exists { case (s1, e1) => s1 <= s2 && e2 <= e1 }
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
  override def prettyName: String = "intervals_contain"
}

/** Minimum gap between any interval pair (0 when any pair overlaps). */
case class IntervalsMinDist(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] =
    Seq(TemporalExpressions.IntervalsType, TemporalExpressions.IntervalsType)
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = TemporalExpressions.intervals(a)
    val ys = TemporalExpressions.intervals(b)
    if (xs.isEmpty || ys.isEmpty) null
    else {
      var best = Long.MaxValue
      xs.foreach { case (s1, e1) =>
        ys.foreach { case (s2, e2) =>
          val d =
            if (s1 <= e2 && s2 <= e1) 0L
            else if (s1 > e2) s1 - e2
            else s2 - e1
          if (d < best) best = d
        }
      }
      best
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
  override def prettyName: String = "intervals_mindist"
}

/** Snap every coordinate of a geometry to a regular grid
  * (round(v / cell) * cell) — the discretization preprocessing step
  * (reference discretize_cords.cpp:38-333, reduced to its geometric core).
  * Degenerate results (collapsed rings) -> null. */
case class StSnapToGrid(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, DoubleType)
  override def dataType: DataType = BinaryType
  override def nullSafeEval(a: Any, c: Any): Any = {
    val g = graft.core.GeometryCodec.fromWkb(a.asInstanceOf[Array[Byte]])
    val cell = c.asInstanceOf[Double]
    if (g == null || cell <= 0) null
    else try {
      val snapped = g.copy()
      snapped.apply(new org.locationtech.jts.geom.CoordinateFilter {
        override def filter(coord: org.locationtech.jts.geom.Coordinate): Unit = {
          coord.x = math.rint(coord.x / cell) * cell
          coord.y = math.rint(coord.y / cell) * cell
        }
      })
      snapped.geometryChanged()
      if (snapped.isValid) graft.core.GeometryCodec.toWkb(snapped) else null
    } catch { case _: Exception => null }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
  override def prettyName: String = "st_snaptogrid"
}
