package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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
  *
  * All predicates generate real code (static calls into the kernels below,
  * walking ArrayData in place) — interval predicates run per joined pair in
  * spatio-temporal joins, exactly where fallback eval would hurt.
  */
object TemporalExpressions {
  val IntervalType: StructType = StructType(Seq(
    StructField("start", LongType, nullable = false),
    StructField("end", LongType, nullable = false)))
  val IntervalsType: ArrayType = ArrayType(IntervalType)

  /** True iff any interval of `a` overlaps any interval of `b` (closed
    * intervals). Direct ArrayData walk — no tuple materialization. Null
    * elements (legal from SQL array literals) are skipped, like
    * SigAgreement. */
  def overlap(a: ArrayData, b: ArrayData): Boolean = {
    val n = a.numElements(); val m = b.numElements()
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val x = a.getStruct(i, 2)
        val s1 = x.getLong(0); val e1 = x.getLong(1)
        var j = 0
        while (j < m) {
          if (!b.isNullAt(j)) {
            val y = b.getStruct(j, 2)
            if (s1 <= y.getLong(1) && y.getLong(0) <= e1) return true
          }
          j += 1
        }
      }
      i += 1
    }
    false
  }

  /** True iff every interval of `b` lies inside some interval of `a`
    * (and `b` is non-empty). */
  def contain(a: ArrayData, b: ArrayData): Boolean = {
    val n = a.numElements(); val m = b.numElements()
    if (m == 0) return false
    var j = 0
    while (j < m) {
      if (!b.isNullAt(j)) {
        val y = b.getStruct(j, 2)
        val s2 = y.getLong(0); val e2 = y.getLong(1)
        var covered = false
        var i = 0
        while (i < n && !covered) {
          if (!a.isNullAt(i)) {
            val x = a.getStruct(i, 2)
            covered = x.getLong(0) <= s2 && e2 <= x.getLong(1)
          }
          i += 1
        }
        if (!covered) return false
      }
      j += 1
    }
    true
  }

  /** Minimum gap between any interval pair (0 when any pair overlaps);
    * null when either side is empty. */
  def mindist(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements(); val m = b.numElements()
    if (n == 0 || m == 0) return null
    var best = Long.MaxValue
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val x = a.getStruct(i, 2)
        val s1 = x.getLong(0); val e1 = x.getLong(1)
        var j = 0
        while (j < m) {
          if (!b.isNullAt(j)) {
            val y = b.getStruct(j, 2)
            val s2 = y.getLong(0); val e2 = y.getLong(1)
            val d =
              if (s1 <= e2 && s2 <= e1) 0L
              else if (s1 > e2) s1 - e2
              else s2 - e1
            if (d < best) best = d
          }
          j += 1
        }
      }
      i += 1
    }
    if (best == Long.MaxValue) null else java.lang.Long.valueOf(best)
  }

  /** StSnapToGrid kernel: snap every coordinate to a regular grid;
    * degenerate results (collapsed rings) -> null. */
  def snapToGrid(bytes: Array[Byte], cell: Double): Array[Byte] = {
    val g = graft.core.GeometryCodec.fromWkb(bytes)
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
}

/** True iff any interval of `left` overlaps any interval of `right`
  * (closed intervals: a.start <= b.end && b.start <= a.end). */
case class IntervalsOverlap(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(TemporalExpressions.IntervalsType, TemporalExpressions.IntervalsType)
  override def dataType: DataType = BooleanType
  override def nullSafeEval(a: Any, b: Any): Any =
    TemporalExpressions.overlap(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TemporalExpressions.overlap($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
  override def prettyName: String = "intervals_overlap"
}

/** True iff every interval of `right` lies inside some interval of `left`. */
case class IntervalsContain(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(TemporalExpressions.IntervalsType, TemporalExpressions.IntervalsType)
  override def dataType: DataType = BooleanType
  override def nullSafeEval(a: Any, b: Any): Any =
    TemporalExpressions.contain(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TemporalExpressions.contain($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
  override def prettyName: String = "intervals_contain"
}

/** Minimum gap between any interval pair (0 when any pair overlaps). */
case class IntervalsMinDist(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(TemporalExpressions.IntervalsType, TemporalExpressions.IntervalsType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    TemporalExpressions.mindist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => GeomCodegen.nullableCall(ctx, ev,
      "java.lang.Long", s"graft.functions.TemporalExpressions.mindist($a, $b)",
      ".longValue()"))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
  override def prettyName: String = "intervals_mindist"
}

/** Snap every coordinate of a geometry to a regular grid
  * (round(v / cell) * cell) — the discretization preprocessing step
  * (reference discretize_cords.cpp:38-333, reduced to its geometric core).
  * Degenerate results (collapsed rings) -> null. */
case class StSnapToGrid(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, DoubleType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any, c: Any): Any =
    TemporalExpressions.snapToGrid(a.asInstanceOf[Array[Byte]], c.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, c) => GeomCodegen.nullableCall(ctx, ev,
      "byte[]", s"graft.functions.TemporalExpressions.snapToGrid($a, $c)", ""))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
  override def prettyName: String = "st_snaptogrid"
}
