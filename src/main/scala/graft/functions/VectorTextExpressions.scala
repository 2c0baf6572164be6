package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Cosine similarity between two float vectors, accumulated in double
  * (left-to-right, deterministic). Embedding columns are ArrayType(FloatType)
  * as in /root/testdata parquet; doubles also accepted via cast. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSimilarity.cosine(
      a.asInstanceOf[ArrayData].toFloatArray(),
      b.asInstanceOf[ArrayData].toFloatArray())
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
  override def prettyName: String = "cosine_similarity"
}

object CosineSimilarity {
  /** The one cosine kernel (double accumulation, left-to-right): shared by
    * the expression and Similarity's heap-based top-k so both paths produce
    * bit-identical scores. Returns null (boxed) for mismatched/zero/empty
    * vectors — the expression's null semantics. */
  def cosine(x: Array[Float], y: Array[Float]): java.lang.Double = {
    if (x == null || y == null || x.length != y.length || x.length == 0) null
    else {
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      var i = 0
      while (i < x.length) {
        val xi = x(i).toDouble; val yi = y(i).toDouble
        dot += xi * yi; nx += xi * xi; ny += yi * yi
        i += 1
      }
      if (nx == 0.0 || ny == 0.0) null
      else java.lang.Double.valueOf(dot / (math.sqrt(nx) * math.sqrt(ny)))
    }
  }
}

/** Dot product of two float vectors, double accumulation. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toFloatArray()
    val y = b.asInstanceOf[ArrayData].toFloatArray()
    if (x.length != y.length) null
    else {
      var dot = 0.0; var i = 0
      while (i < x.length) { dot += x(i).toDouble * y(i).toDouble; i += 1 }
      dot
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
  override def prettyName: String = "dot_product"
}

object Hash64 {
  /** FNV-1a 64 over UTF-8 bytes, finalized with splitmix64 — a fast,
    * dependency-free, deterministic 64-bit string hash (public-domain
    * constructions). `seed` decorrelates hash families. */
  def hash(s: UTF8String, seed: Long): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    // splitmix64 finalizer for avalanche
    h += 0x9e3779b97f4a7c15L
    h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
    h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }
}

/** 64-bit SimHash of a whitespace-tokenized document: each token votes its
  * hash bits +-1; the sign of each bit-sum forms the fingerprint. Near-dup
  * detection = small Hamming distance between fingerprints. */
case class SimHash64(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any = {
    val text = v.asInstanceOf[UTF8String].toString
    val counts = new Array[Int](64)
    var start = 0
    val n = text.length
    var i = 0
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        if (i > start) {
          val h = Hash64.hash(UTF8String.fromString(text.substring(start, i)), 0L)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "simhash64"
}

/** Polynomial rolling hash of a string (base 31, 64-bit wraparound) — the
  * document-fingerprinting primitive (deterministic, order-sensitive). */
case class RollingHash64(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 31L + (bytes(i) & 0xffL); i += 1 }
    h
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "rolling_hash64"
}

/** Count of equal positions between two long arrays — MinHash signature
  * agreement. A primitive loop (two toLongArray copies, no boxing)
  * replacing the size(filter(zip_with(...))) chain, which allocates three
  * boxed arrays per call; this runs once per band-collision candidate
  * pair, a count quadratic in bucket size on duplicate-heavy corpora. */
case class SigAgreement(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any = {
    // walk the ArrayData directly: primitive getLong, and a null element
    // (legal from SQL array literals) counts as non-agreeing instead of
    // throwing like toLongArray would
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i) && x.getLong(i) == y.getLong(i)) c += 1
      i += 1
    }
    c
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
  override def prettyName: String = "sig_agreement"
}

/** Seeded 64-bit string hash as an expression (MinHash hash family). */
case class SeededHash64(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(StringType, LongType)
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, s: Any): Any =
    Hash64.hash(a.asInstanceOf[UTF8String], s.asInstanceOf[Long])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
  override def prettyName: String = "seeded_hash64"
}
