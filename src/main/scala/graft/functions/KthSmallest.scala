package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Bounded max-heap of the k smallest doubles seen so far. Array-backed
  * binary heap, `arr(0)` is the current k-th smallest once full. */
final class KthHeap(val k: Int) extends Serializable {
  val arr = new Array[Double](k)
  var n = 0

  def insert(v: Double): Unit = {
    if (n < k) {
      arr(n) = v; n += 1
      // sift up
      var i = n - 1
      while (i > 0 && arr((i - 1) / 2) < arr(i)) {
        val p = (i - 1) / 2
        val t = arr(p); arr(p) = arr(i); arr(i) = t
        i = p
      }
    } else if (v < arr(0)) {
      arr(0) = v
      // sift down
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = 2 * i + 2
        var m = i
        if (l < n && arr(l) > arr(m)) m = l
        if (r < n && arr(r) > arr(m)) m = r
        if (m == i) done = true
        else { val t = arr(m); arr(m) = arr(i); arr(i) = t; i = m }
      }
    }
  }
}

/** Exact k-th smallest of a double column — a TypedImperativeAggregate so
  * Spark runs it with MAP-SIDE PARTIAL AGGREGATION (ObjectHashAggregate):
  * state is a k-bounded heap, the shuffle carries ≤ k doubles per group
  * instead of every candidate row, and no sort happens anywhere. This is
  * the kNN probe phase's radius extractor: the k-th smallest candidate
  * distance is a valid upper bound on the true k-th-NN distance for ANY
  * candidate subset ordering (ties included), so the window rank the probe
  * previously used — a full shuffle + per-left sort of the candidate
  * relation — is overkill. Returns null when fewer than k values arrived
  * (caller falls back to its cell-granular radius). */
case class KthSmallest(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KthHeap] with UnaryLike[Expression] {

  require(k >= 1, "kth_smallest: k must be >= 1")

  override def createAggregationBuffer(): KthHeap = new KthHeap(k)

  override def update(b: KthHeap, input: InternalRow): KthHeap = {
    val v = child.eval(input)
    if (v != null) b.insert(v.asInstanceOf[Double])
    b
  }

  override def merge(b: KthHeap, o: KthHeap): KthHeap = {
    var i = 0
    while (i < o.n) { b.insert(o.arr(i)); i += 1 }
    b
  }

  override def eval(b: KthHeap): Any = if (b.n < k) null else b.arr(0)

  override def serialize(b: KthHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * b.n)
    bb.putInt(b.n)
    var i = 0
    while (i < b.n) { bb.putDouble(b.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KthHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new KthHeap(k)
    h.n = n
    var i = 0
    while (i < n) { h.arr(i) = bb.getDouble; i += 1 }
    h
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "kth_smallest"

  override def withNewMutableAggBufferOffset(o: Int): KthSmallest =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KthSmallest =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): KthSmallest =
    copy(child = newChild)
}
