package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Cosine similarity between two float vectors, accumulated in double
  * (left-to-right, deterministic). Embedding columns are ArrayType(FloatType)
  * as in /root/testdata parquet; doubles also accepted via cast.
  *
  * Real codegen, not CodegenFallback: this is the per-candidate refine of
  * every ANN path (LSH pairs/top-k, IVF search) — a fallback would demote
  * the refine stage out of whole-stage codegen exactly where candidate
  * volume peaks. The generated loop reads ArrayData in place (getFloat,
  * no array copy) and accumulates identically to the interpreted kernel. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  // returns null for length-mismatched or zero-norm inputs even when both
  // children are non-nullable; without this override nullSafeCodeGen would
  // never declare ev.isNull and the generated assignment wouldn't compile
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSimilarity.cosine(
      a.asInstanceOf[ArrayData].toFloatArray(),
      b.asInstanceOf[ArrayData].toFloatArray())
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements() || $n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $xi = (double) $a.getFloat($i);
         |    final double $yi = (double) $b.getFloat($i);
         |    $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |  }
         |  if ($nx == 0.0 || $ny == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |  }
         |}
       """.stripMargin
    })
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

/** Dot product of two float vectors, double accumulation. Codegen'd like
  * [[CosineSimilarity]] — same in-place ArrayData loop, no array copy. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  // null on length mismatch regardless of child nullability (see
  // CosineSimilarity.nullable)
  override def nullable: Boolean = true
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
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })
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

  /** FNV-1a 64 + splitmix finalizer over a byte RANGE — the binary twin of
    * [[hash]], shared by the CDC chunker and the video sample hasher. */
  def hashByteRange(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h += 0x9e3779b97f4a7c15L
    h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
    h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  /** SimHash64 kernel — shared by the interpreted eval and the generated
    * code (a top-level object gets Java static forwarders, so codegen calls
    * `graft.functions.Hash64.simhash(...)` directly). */
  def simhash(str: UTF8String): Long = {
    val text = str.toString
    val counts = new Array[Int](64)
    var start = 0
    val n = text.length
    var i = 0
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        if (i > start) {
          val h = hash(UTF8String.fromString(text.substring(start, i)), 0L)
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

  /** RollingHash64 kernel (base-31 polynomial over UTF-8 bytes). */
  def rolling(str: UTF8String): Long = {
    val bytes = str.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 31L + (bytes(i) & 0xffL); i += 1 }
    h
  }

  /** Word-n-gram shingle kernel, one pass over the document. Semantics are
    * pinned to the relational formulation the DuckDB oracles re-derive:
    * tokens = split on the single character ' ' keeping empty tokens
    * (leading/trailing/consecutive spaces), shingle_i = tokens[i..i+n-1]
    * joined by ' ', fewer than n tokens → empty result; `distinct` keeps
    * first occurrences in order (array_distinct semantics). Because the
    * separator is exactly one space, each shingle IS a substring of the
    * original text (from token i's start to token i+n-1's end), so the
    * kernel allocates one boundary array + one substring per shingle —
    * no per-element split/slice/concat re-evaluation, which is where the
    * higher-order-function formulation burned ~30 s of CPU at sf0.1 (the
    * lambda re-derives the token array per element; HOF lambdas sit
    * outside whole-stage codegen's subexpression elimination). */
  def wordShingles(str: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val text = str.toString
    val len = text.length
    // token i spans [starts(i), starts(i+1) - 1); sentinel starts(W) = len+1
    var w = 1
    var i = 0
    while (i < len) { if (text.charAt(i) == ' ') w += 1; i += 1 }
    if (w < n) return new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Any](0))
    val starts = new Array[Int](w + 1)
    starts(0) = 0
    var t = 1
    i = 0
    while (i < len) {
      if (text.charAt(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(w) = len + 1
    val m = w - n + 1
    if (distinct) {
      val seen = new java.util.LinkedHashSet[UTF8String](m * 2)
      i = 0
      while (i < m) {
        seen.add(UTF8String.fromString(text.substring(starts(i), starts(i + n) - 1)))
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        seen.toArray(new Array[AnyRef](seen.size)).asInstanceOf[Array[Any]])
    } else {
      val out = new Array[Any](m)
      i = 0
      while (i < m) {
        out(i) = UTF8String.fromString(text.substring(starts(i), starts(i + n) - 1))
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  /** Character-n-gram kernel: substr(text, i, n) by CODE POINTS for every
    * start 1..len-n+1, matching DuckDB's substr counting (code-unit
    * indexing would diverge on astral chars). */
  def charShingles(str: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val text = str.toString
    // code point start offsets (in code units) + sentinel end — a plain
    // int[] sized by the code-unit upper bound (this is a scan-stage hot
    // kernel; one boxed Integer per character was measurable allocation)
    val cps = new Array[Int](text.length + 1)
    var total = 0
    var i = 0
    while (i < text.length) {
      cps(total) = i
      total += 1
      i += Character.charCount(text.codePointAt(i))
    }
    cps(total) = text.length
    val m = total - n + 1
    if (m <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Any](0))
    if (distinct) {
      val seen = new java.util.LinkedHashSet[UTF8String](m * 2)
      var j = 0
      while (j < m) {
        seen.add(UTF8String.fromString(text.substring(cps(j), cps(j + n))))
        j += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        seen.toArray(new Array[AnyRef](seen.size)).asInstanceOf[Array[Any]])
    } else {
      val out = new Array[Any](m)
      var j = 0
      while (j < m) {
        out(j) = UTF8String.fromString(text.substring(cps(j), cps(j + n)))
        j += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }
}

/** 64-bit SimHash of a whitespace-tokenized document: each token votes its
  * hash bits +-1; the sign of each bit-sum forms the fingerprint. Near-dup
  * detection = small Hamming distance between fingerprints. Codegen is a
  * static call into the shared [[Hash64.simhash]] kernel — keeps the
  * document-scan stage inside whole-stage codegen. */
case class SimHash64(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    Hash64.simhash(v.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash64.simhash($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "simhash64"
}

/** Polynomial rolling hash of a string (base 31, 64-bit wraparound) — the
  * document-fingerprinting primitive (deterministic, order-sensitive).
  * Codegen = static call into [[Hash64.rolling]]. */
case class RollingHash64(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    Hash64.rolling(v.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash64.rolling($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "rolling_hash64"
}

/** Count of equal positions between two long arrays — MinHash signature
  * agreement. A primitive loop (direct ArrayData walk, no boxing) replacing
  * the size(filter(zip_with(...))) chain, which allocates three boxed
  * arrays per call; this runs once per band-collision candidate pair, a
  * count quadratic in bucket size on duplicate-heavy corpora. Generates
  * real codegen (not CodegenFallback): a fallback here demotes the whole
  * LSH pair-join stage out of whole-stage codegen — measured 4.3-5.0 s vs
  * 2.1-3.0 s for the codegen'd zip_with chain it was meant to beat. */
case class SigAgreement(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
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
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i) &&
         |      $a.getLong($i) == $b.getLong($i)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
  override def prettyName: String = "sig_agreement"
}

/** Seeded 64-bit string hash as an expression (MinHash hash family).
  * Codegen = static call into [[Hash64.hash]]. */
case class SeededHash64(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, LongType)
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, s: Any): Any =
    Hash64.hash(a.asInstanceOf[UTF8String], s.asInstanceOf[Long])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, s) => s"graft.functions.Hash64.hash($a, $s)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
  override def prettyName: String = "seeded_hash64"
}

/** Word-n-gram shingles of a document as a single codegen'd kernel call
  * (see [[Hash64.wordShingles]] for the pinned semantics). Null text yields
  * null here; the Column wrappers coalesce to the empty array the
  * relational formulation produced. */
case class WordShingles(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1, "shingle width must be >= 1")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    Hash64.wordShingles(v.asInstanceOf[UTF8String], n, distinct)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Hash64.wordShingles($c, $n, $distinct)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = if (distinct) "word_shingles" else "word_shingles_all"
}

/** Character-n-gram shingles (the language-ID / fuzzy-matching twin of
  * [[WordShingles]]): one substring per start offset 0..len-n, in order;
  * `distinct` keeps first occurrences. Same pinned relational semantics —
  * substr(text, i, n) for i in 1..len-n+1 — so a DuckDB comprehension
  * reproduces it exactly. Shorter-than-n text yields []. */
case class CharShingles(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1, s"char shingle width must be >= 1, got $n")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    Hash64.charShingles(v.asInstanceOf[UTF8String], n, distinct)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Hash64.charShingles($c, $n, $distinct)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String =
    if (distinct) "char_shingles" else "char_shingles_all"
}

/** One member of the affine MinHash family: `a * x + b` with 64-bit wrap
  * (Java long semantics regardless of spark.sql.ansi.enabled — a plain
  * Column multiply would throw ARITHMETIC_OVERFLOW under ANSI). `a` odd
  * makes x → a*x+b a bijection on Z/2^64, the textbook 2-universal
  * permutation family for MinHash over an already-avalanched 64-bit key;
  * min under signed long order is min of a consistent reordering, which is
  * all MinHash needs. One mul+add per seed replaces a full seeded-hash
  * avalanche — the signature aggregation evaluates numHashes of these per
  * shingle row, so the constant factor is the whole game. */
case class AffineHash(child: Expression, a: Long, b: Long)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any = a * v.asInstanceOf[Long] + b
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"(${a}L * $c + ${b}L)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "affine_hash"
}

/** Full BPE tokenizer application: pretokenize with the GPT-2-style pattern
  * (group-1 matches, identical to `TextFunctions.bpePretokens`), then merge
  * each pretoken's code-point symbols under the trained merge list —
  * repeatedly find the lowest-rank adjacent pair present and combine all
  * its occurrences left-to-right (the standard greedy encode, equal to
  * sequential rank-order passes on any WELL-FORMED list, i.e. one where a
  * merge's symbols come from characters or strictly earlier merges — what
  * [[graft.text.BpeTrainer.train]] produces by construction).
  *
  * The merge list lives ON the expression (a rank map built once per
  * executor thread) and ships inside the serialized plan: at a production
  * 50k-merge vocabulary that is a few MB once per task binary — the same
  * cost class as a small broadcast, with no extra join in the plan. The
  * encode loop is a generated-code static-shaped call through a codegen
  * reference object ([[StDiscretize]]'s binding pattern), so the document
  * scan stays inside whole-stage codegen. Cost per word: O(len × merges
  * actually applied), never O(vocab). */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  // key = left-length-prefixed concatenation: unambiguous even when symbols
  // contain any separator character (whitespace runs ARE pretokens here)
  private def pairKey(a: String, b: String): String = a.length + ":" + a + b

  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    var i = 0
    merges.foreach { case (a, b) =>
      require(a.nonEmpty && b.nonEmpty, "BPE merge symbols are non-empty")
      m.putIfAbsent(pairKey(a, b), i)
      i += 1
    }
    m
  }
  @transient private lazy val pretokenRe =
    java.util.regex.Pattern.compile(graft.text.TextFunctions.BpePretokenPattern)

  private def encodeWord(w: String, out: java.util.ArrayList[UTF8String]): Unit = {
    // code-point symbols (matches the trainer's split-on-"" char table)
    var syms = new java.util.ArrayList[String](w.length)
    var ci = 0
    while (ci < w.length) {
      val cp = w.codePointAt(ci)
      val n = Character.charCount(cp)
      syms.add(w.substring(ci, ci + n))
      ci += n
    }
    var continue = true
    while (continue && syms.size >= 2) {
      var best = Int.MaxValue
      var i = 0
      while (i < syms.size - 1) {
        val r = ranks.get(pairKey(syms.get(i), syms.get(i + 1)))
        if (r != null && r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) continue = false
      else {
        val (a, b) = merges(best)
        val next = new java.util.ArrayList[String](syms.size)
        var j = 0
        while (j < syms.size) {
          if (j < syms.size - 1 && syms.get(j) == a && syms.get(j + 1) == b) {
            next.add(a + b); j += 2
          } else { next.add(syms.get(j)); j += 1 }
        }
        syms = next
      }
    }
    var k = 0
    while (k < syms.size) { out.add(UTF8String.fromString(syms.get(k))); k += 1 }
  }

  def encode(str: UTF8String): ArrayData = {
    val text = str.toString
    val m = pretokenRe.matcher(text)
    val out = new java.util.ArrayList[UTF8String]()
    while (m.find()) encodeWord(m.group(1), out)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(new Array[AnyRef](out.size)).asInstanceOf[Array[Any]])
  }

  override def nullSafeEval(v: Any): Any = encode(v.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncode", this, classOf[BpeEncode].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "bpe_encode"
}

/** Span-cut kernel for duplicated-span dedup: given a document and the
  * sorted-or-not array of LOSING span start positions (token indices), drop
  * every token covered by some [start, start+k-1] window and reassemble the
  * survivors with single spaces. Token boundaries are the pinned
  * single-space split (empty tokens kept) — the same tokenization as
  * [[Hash64.wordShingles]], so start positions line up with the gram
  * stream. Returns null when no token survives (the caller drops those
  * documents). One pass over the text plus a sorted sweep over the starts:
  * O(len + spans log spans) — replaces a full-corpus token explode,
  * anti-join, and collect_list reassembly (measured 113 s / 1.4 GB shuffle
  * at the 500k-doc rehearsal) with a scan-stage expression. */
/** WordPiece greedy longest-match tokenizer application (Schuster &
  * Nakajima ICASSP'12; the BERT tokenizer family). Words are the pinned
  * single-space tokens ([[graft.text.TextFunctions.tokens]] — WordPiece
  * rides a whitespace basic tokenizer, unlike BPE's GPT-2 regex
  * pretokens). Per word: repeatedly take the LONGEST vocabulary entry
  * prefixing the remainder — continuations look up with the `##` prefix —
  * and if any position finds no match the WHOLE word becomes `unk`
  * (BERT's semantics, not per-character fallback).
  *
  * The vocabulary rides the expression as a hash set (the [[BpeEncode]]
  * shipping pattern: a production 30k-entry vocab is a few hundred KB in
  * the task binary, no join in the plan), and the inner loop is bounded
  * by the longest vocab entry, so per-word cost is O(len × maxTokenLen)
  * hash probes worst case — independent of vocabulary size. Codegen via
  * the reference-object call, keeping the scan in whole-stage codegen. */
case class WordPieceEncode(child: Expression, vocab: Seq[String], unk: String)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val vocabSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](math.max(16, vocab.size * 2))
    vocab.foreach { v => require(v.nonEmpty, "vocab entries are non-empty"); s.add(v) }
    s
  }
  // longest consumable span per lane: bare entries consume their full
  // length, continuation (##) entries consume length - 2
  @transient private lazy val maxBare: Int =
    vocab.iterator.filterNot(_.startsWith("##")).map(_.length).foldLeft(0)(math.max)
  @transient private lazy val maxCont: Int =
    vocab.iterator.filter(_.startsWith("##")).map(_.length - 2).foldLeft(0)(math.max)

  private def encodeWord(w: String, out: java.util.ArrayList[UTF8String]): Unit = {
    val toks = new java.util.ArrayList[String](4)
    var start = 0
    var fail = false
    while (start < w.length && !fail) {
      val isCont = start > 0
      val cap = if (isCont) maxCont else maxBare
      var end = start + math.min(w.length - start, cap)
      var found: String = null
      while (end > start && found == null) {
        val cand =
          if (isCont) "##" + w.substring(start, end) else w.substring(start, end)
        if (vocabSet.contains(cand)) found = cand else end -= 1
      }
      if (found == null) fail = true
      else { toks.add(found); start = end }
    }
    if (fail) out.add(UTF8String.fromString(unk))
    else {
      var i = 0
      while (i < toks.size) { out.add(UTF8String.fromString(toks.get(i))); i += 1 }
    }
  }

  def encode(str: UTF8String): ArrayData = {
    val text = str.toString
    val out = new java.util.ArrayList[UTF8String]()
    var wstart = 0
    val n = text.length
    while (wstart <= n) {
      var wend = text.indexOf(' ', wstart)
      if (wend < 0) wend = n
      if (wend > wstart) encodeWord(text.substring(wstart, wend), out)
      wstart = wend + 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(new Array[AnyRef](out.size)).asInstanceOf[Array[Any]])
  }

  override def nullSafeEval(v: Any): Any = encode(v.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("wpEncode", this, classOf[WordPieceEncode].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "wordpiece_encode"
}

case class RemoveCoveredTokens(text: Expression, starts: Expression, k: Int)
    extends BinaryExpression with ImplicitCastInputTypes {
  require(k >= 1, s"span width must be >= 1, got $k")
  override def left: Expression = text
  override def right: Expression = starts
  override def inputTypes: Seq[DataType] =
    Seq(StringType, ArrayType(IntegerType))
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  def compute(str: UTF8String, st: ArrayData): UTF8String = {
    val s = str.toString
    val sorted = st.toIntArray()
    java.util.Arrays.sort(sorted)
    val out = new java.lang.StringBuilder(s.length)
    var any = false
    var si = 0      // pointer into sorted starts
    var tok = 0     // current token index
    var tokStart = 0
    var i = 0
    val n = s.length
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        // token `tok` spans chars [tokStart, i)
        while (si < sorted.length && sorted(si) + k - 1 < tok) si += 1
        val covered = si < sorted.length && sorted(si) <= tok
        if (!covered) {
          if (any) out.append(' ')
          out.append(s, tokStart, i)
          any = true
        }
        tok += 1
        tokStart = i + 1
      }
      i += 1
    }
    if (!any) null else UTF8String.fromString(out.toString)
  }

  override def nullSafeEval(t: Any, st: Any): Any =
    compute(t.asInstanceOf[UTF8String], st.asInstanceOf[ArrayData])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("removeCovered", this,
      classOf[RemoveCoveredTokens].getName)
    nullSafeCodeGen(ctx, ev, (t, st) => {
      val tmp = ctx.freshName("cut")
      s"""
         |UTF8String $tmp = $ref.compute($t, $st);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
       """.stripMargin
    })
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(text = l, starts = r)
  override def prettyName: String = "remove_covered_tokens"
}

/** Count-Min-Sketch threshold probe over a 64-bit key column: true iff the
  * sketch's estimate for the key is >= `min`. Like [[BloomContainsLong]],
  * the sketch is a codegen reference object riding the task binary, so the
  * probe is a scan predicate — the heavy-hitter prefilter of
  * [[graft.text.FrequentItems.heavyHitters]]. CMS never underestimates, so
  * a `false` is definitive (the key's true count is below min); `true` may
  * be collision-inflated — the caller's exact aggregate settles it. */
case class CmsAtLeast(child: Expression,
                      cms: org.apache.spark.util.sketch.CountMinSketch,
                      min: Long)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def nullSafeEval(v: Any): Any =
    cms.estimateCount(v.asInstanceOf[Long]) >= min
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("cms", cms,
      classOf[org.apache.spark.util.sketch.CountMinSketch].getName)
    defineCodeGen(ctx, ev, c =>
      s"$ref.estimateCount((Object) ((Long) $c)) >= ${min}L")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "cms_at_least"
}

/** Deflate compression ratio of a document (compressed bytes / UTF-8
  * bytes, level-6 zlib): the Gopher-class repetition/quality signal —
  * boilerplate and machine-generated repetition compress far below
  * natural text, random noise compresses above 1. Deterministic for a
  * given JDK deflater (same level, same input ⇒ same output size);
  * ScalaTest-gated, not oracle-gated — no SQL engine re-derives deflate.
  * One Deflater per expression instance, reset between rows (expressions
  * evaluate single-threaded within a task, and codegen binds the instance
  * as a reference object), so the scan does not allocate a native zlib
  * context per document; the native context is released deterministically
  * at task completion (TaskContext listener → end()), not left to GC
  * finalization — long jobs with many tasks would otherwise accumulate
  * native zlib state. Driver-side eval (no TaskContext, tests only) falls
  * back to the Cleaner. Empty text ⇒ null (a 0/0 ratio). */
case class CompressionRatio(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  @transient private lazy val deflater = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null) tc.addTaskCompletionListener[Unit](_ => d.end())
    d
  }
  @transient private lazy val buf = new Array[Byte](8192)

  def compute(str: UTF8String): java.lang.Double = {
    val raw = str.getBytes
    if (raw.length == 0) return null
    deflater.reset()
    deflater.setInput(raw)
    deflater.finish()
    var total = 0L
    while (!deflater.finished()) total += deflater.deflate(buf)
    java.lang.Double.valueOf(total.toDouble / raw.length)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("cratio", this, classOf[CompressionRatio].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("cr")
      s"""
         |java.lang.Double $tmp = $ref.compute($c);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "compression_ratio"
}

/** Unicode normalization (java.text.Normalizer) — the text-cleanup step a
  * multilingual corpus needs before any hash-based dedup (canonically
  * equivalent strings like "e"+COMBINING ACUTE vs precomposed "é" would
  * otherwise shingle and fingerprint differently). `form` is one of
  * NFC/NFD/NFKC/NFKD; NFC matches DuckDB's `nfc_normalize`, which is what
  * makes the gate cross-engine-exact. Spark itself has no normalizer
  * built-in. */
case class NormalizeText(child: Expression, form: String)
    extends UnaryExpression with ImplicitCastInputTypes {
  private val normForm = java.text.Normalizer.Form.valueOf(form)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      v.asInstanceOf[UTF8String].toString, normForm))
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), " +
        s"java.text.Normalizer.Form.$form))")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = s"${form.toLowerCase}_normalize"
}

/** Bloom-filter membership probe over a 64-bit key column. The filter is a
  * codegen reference object — serialized once into the task binary (which
  * Spark torrent-broadcasts per executor, the same transport as an explicit
  * broadcast variable) — so the probe is a scan predicate that never forces
  * a join: the Bloom prefilter of [[graft.text.Decontaminate.flagBloom]].
  * No false negatives (Bloom invariant); false positives are the caller's
  * contract to verify. */
case class BloomContainsLong(child: Expression,
                             bf: org.apache.spark.util.sketch.BloomFilter)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def nullSafeEval(v: Any): Any =
    bf.mightContainLong(v.asInstanceOf[Long])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bf,
      classOf[org.apache.spark.util.sketch.BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "bloom_contains_long"
}

/** HTML → text extraction kernel (the boilerplate-removal front door of a
  * web-crawl pipeline). Pinned semantics, chosen to be exactly replayable
  * as a SQL regex/replace chain so the gate is cross-engine-verifiable:
  *
  *  1. `<script…>…</script>` / `<style…>…</style>` blocks (case-insensitive,
  *     tag name PREFIX match, literal `</script>`/`</style>` close) → one
  *     space; an unclosed block falls through to rule 2 (the open tag alone
  *     is removed, content kept) — the regex `(?is)<script[^>]*>.*?</script>`
  *     behaves identically.
  *  2. `<…>` tags → one space; a `<` with no later `>` is literal text
  *     (regex `<[^>]*>` can't match it either).
  *  3. One decode pass over the remaining text for the core entities
  *     `&lt; &gt; &quot; &#39; &apos; &nbsp; &amp;` — equal to the
  *     sequential replace chain with `&amp;` LAST (the classic order:
  *     `&amp;lt;` decodes to the literal text `&lt;`, never to `<`).
  *  4. Whitespace runs `[ \t\n\r]+` collapse to one space; ends trimmed.
  *
  * Single forward pass, no allocation beyond the output builder. */
object HtmlStrip {
  private[functions] def indexOfIgnoreCase(s: String, target: String, from: Int): Int = {
    val n = s.length - target.length
    var i = math.max(from, 0)
    while (i <= n) {
      if (s.regionMatches(true, i, target, 0, target.length)) return i
      i += 1
    }
    -1
  }

  def strip(s: UTF8String): UTF8String = {
    val in = s.toString
    val n = in.length
    val sb = new java.lang.StringBuilder(n)
    var pendingSpace = false
    def emit(c: Char): Unit = {
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r') pendingSpace = true
      else {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.append(c)
      }
    }
    var i = 0
    while (i < n) {
      val c = in.charAt(i)
      if (c == '<') {
        val close = in.indexOf('>', i + 1)
        if (close < 0) { emit('<'); i += 1 } // unterminated: literal text
        else {
          // block elements whose CONTENT is boilerplate, not text
          val skipTo =
            if (in.regionMatches(true, i + 1, "script", 0, 6)) {
              val e = indexOfIgnoreCase(in, "</script>", close + 1)
              if (e < 0) -1 else e + 9
            } else if (in.regionMatches(true, i + 1, "style", 0, 5)) {
              val e = indexOfIgnoreCase(in, "</style>", close + 1)
              if (e < 0) -1 else e + 8
            } else -1
          pendingSpace = true
          i = if (skipTo < 0) close + 1 else skipTo
        }
      } else if (c == '&') {
        // one-pass decode of the core entity set; unknown entities literal
        def at(lit: String): Boolean =
          in.regionMatches(false, i, lit, 0, lit.length)
        if (at("&lt;")) { emit('<'); i += 4 }
        else if (at("&gt;")) { emit('>'); i += 4 }
        else if (at("&quot;")) { emit('"'); i += 6 }
        else if (at("&#39;")) { emit('\''); i += 5 }
        else if (at("&apos;")) { emit('\''); i += 6 }
        else if (at("&nbsp;")) { emit(' '); i += 6 }
        else if (at("&amp;")) { emit('&'); i += 5 }
        else { emit('&'); i += 1 }
      } else { emit(c); i += 1 }
    }
    UTF8String.fromString(sb.toString)
  }

  /** The DuckDB/ANSI replay of [[strip]] over a text expression — kept next
    * to the kernel so a semantics change breaks both together. */
  def sql(input: String): String = {
    val noScript =
      s"regexp_replace($input, '(?is)<script[^>]*>.*?</script>', ' ', 'g')"
    val noStyle =
      s"regexp_replace($noScript, '(?is)<style[^>]*>.*?</style>', ' ', 'g')"
    val noTags = s"regexp_replace($noStyle, '<[^>]*>', ' ', 'g')"
    val decoded = Seq(
      "&lt;" -> "'<'", "&gt;" -> "'>'", "&quot;" -> "'\"'",
      "&#39;" -> "''''", "&apos;" -> "''''", "&nbsp;" -> "' '",
      "&amp;" -> "'&'"
    ).foldLeft(noTags) { case (acc, (ent, rep)) =>
      s"replace($acc, '$ent', $rep)"
    }
    s"trim(regexp_replace($decoded, '[ \\t\\n\\r]+', ' ', 'g'))"
  }
}

/** Codegen wrapper for [[HtmlStrip.strip]]: tag/boilerplate removal +
  * entity decode + whitespace collapse as one scan-local kernel call —
  * no shuffle, no UDF, stays inside whole-stage codegen. */
case class StripHtml(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    HtmlStrip.strip(v.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlStrip.strip($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "strip_html"
}

/** Block segmentation for boilerplate removal (jusText/readability
  * class — see [[graft.text.Boilerplate]] for the operator contract).
  * One pass over the HTML splits it at block-level tags and emits, per
  * non-empty block, a `struct<text, n_chars, n_link_chars>`: the
  * collapsed text (same whitespace/entity rules as [[HtmlStrip.strip]]),
  * its length, and how many of those characters sat inside `<a>`
  * elements. Everything downstream (link-density + length thresholds,
  * block re-join) is relational — built-in `filter`/`transform`/
  * `array_join` — so the policy stays SQL-replayable from a checkpointed
  * block relation while the parse stays a scan-local kernel. */
object HtmlBlocks {
  private val blockTags: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
      "td", "th", "tr", "table", "article", "section", "header", "footer",
      "nav", "main", "aside", "blockquote", "br", "body", "html", "head",
      "form", "pre").foreach(s.add)
    s
  }

  def blocks(s: UTF8String): ArrayData = {
    val in = s.toString
    val n = in.length
    val out = new java.util.ArrayList[Any]()
    val sb = new java.lang.StringBuilder(64)
    var pendingSpace = false
    var linkDepth = 0
    var linkChars = 0
    def emit(c: Char): Unit = {
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r') pendingSpace = true
      else {
        if (pendingSpace && sb.length > 0) {
          sb.append(' ')
          if (linkDepth > 0) linkChars += 1
        }
        pendingSpace = false
        sb.append(c)
        if (linkDepth > 0) linkChars += 1
      }
    }
    def flush(): Unit = {
      if (sb.length > 0) {
        out.add(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](UTF8String.fromString(sb.toString), sb.length, linkChars)))
      }
      sb.setLength(0); linkChars = 0; pendingSpace = false
      // links are block-scoped: browsers implicitly close <a> at block
      // boundaries, and resetting here bounds a never-closed anchor's
      // damage to its own block
      linkDepth = 0
    }
    var i = 0
    while (i < n) {
      val c = in.charAt(i)
      if (c == '<') {
        val close = in.indexOf('>', i + 1)
        if (close < 0) { emit('<'); i += 1 } // unterminated: literal text
        else {
          // tag name: after '<' and an optional '/'
          var ns = i + 1
          val closing = ns < n && in.charAt(ns) == '/'
          if (closing) ns += 1
          var ne = ns
          while (ne < close && Character.isLetterOrDigit(in.charAt(ne))) ne += 1
          val name = in.substring(ns, ne).toLowerCase
          if (!closing && name == "script") {
            val e = HtmlStrip.indexOfIgnoreCase(in, "</script>", close + 1)
            flush() // boilerplate content never joins a text block
            i = if (e < 0) n else e + 9
          } else if (!closing && name == "style") {
            val e = HtmlStrip.indexOfIgnoreCase(in, "</style>", close + 1)
            flush()
            i = if (e < 0) n else e + 8
          } else {
            if (blockTags.contains(name)) flush()
            else if (name == "a") {
              // HTML5: a trailing '/' before '>' is ignored on non-void
              // tags, and unquoted hrefs routinely end in '/' — so every
              // opening <a ...> opens a link, never "self-closes"
              if (closing) linkDepth = math.max(0, linkDepth - 1)
              else linkDepth += 1
            }
            pendingSpace = true
            i = close + 1
          }
        }
      } else if (c == '&') {
        def at(lit: String): Boolean =
          in.regionMatches(false, i, lit, 0, lit.length)
        if (at("&lt;")) { emit('<'); i += 4 }
        else if (at("&gt;")) { emit('>'); i += 4 }
        else if (at("&quot;")) { emit('"'); i += 6 }
        else if (at("&#39;")) { emit('\''); i += 5 }
        else if (at("&apos;")) { emit('\''); i += 6 }
        else if (at("&nbsp;")) { emit(' '); i += 6 }
        else if (at("&amp;")) { emit('&'); i += 5 }
        else { emit('&'); i += 1 }
      } else { emit(c); i += 1 }
    }
    flush()
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(new Array[AnyRef](out.size)).asInstanceOf[Array[Any]])
  }
}

/** Codegen wrapper for [[HtmlBlocks.blocks]]. */
case class HtmlBlockStats(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_link_chars", IntegerType, nullable = false))),
    containsNull = false)
  override def nullSafeEval(v: Any): Any =
    HtmlBlocks.blocks(v.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlBlocks.blocks($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "html_blocks"
}

/** One-pass URL canonicalization kernel — the crawl-scale form of
  * [[graft.text.UrlCurate.canonicalizeUrl]] (see there for the rewrite
  * contract: scheme/host case, www, default ports, fragment, tracking
  * params, param sort, trailing slash). A single string walk replaces
  * the equivalent built-in composition, whose Column reuse inlines each
  * sub-parse everywhere it is referenced (the expression is a tree, not
  * a DAG) — measured 5M URLs: 17.8 s composed scan vs ~1 s kernel.
  * Returns null for non-http(s)/empty-host input (the malformed-row
  * convention). Query params sort in UTF8String binary order — the same
  * order array_sort used in the composed form. */
case class CanonicalizeUrl(child: Expression, dropParams: Seq[String])
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  @transient private lazy val dropSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](dropParams.size * 2)
    dropParams.foreach(p => s.add(p.toLowerCase))
    s
  }

  def canon(u: UTF8String): UTF8String = {
    val raw = u.toString
    var b = 0; var e = raw.length
    while (b < e && Character.isWhitespace(raw.charAt(b))) b += 1
    while (e > b && Character.isWhitespace(raw.charAt(e - 1))) e -= 1
    val s = raw.substring(b, e)
    val si = s.indexOf("://")
    if (si < 0) return null
    val scheme = s.substring(0, si).toLowerCase
    if (scheme != "http" && scheme != "https") return null
    var rest = s.substring(si + 3)
    val hi = rest.indexOf('#')
    if (hi >= 0) rest = rest.substring(0, hi)
    val qi = rest.indexOf('?')
    val hostPath = if (qi >= 0) rest.substring(0, qi) else rest
    val query = if (qi >= 0) rest.substring(qi + 1) else ""
    val pi = hostPath.indexOf('/')
    val hostPort = (if (pi >= 0) hostPath.substring(0, pi) else hostPath).toLowerCase
    var path = if (pi >= 0) hostPath.substring(pi) else ""
    val ci = hostPort.indexOf(':')
    var host = if (ci >= 0) hostPort.substring(0, ci) else hostPort
    val port = if (ci >= 0) hostPort.substring(ci + 1) else ""
    if (host.startsWith("www.")) host = host.substring(4)
    if (host.isEmpty) return null
    val keepPort = port.nonEmpty &&
      !((scheme == "http" && port == "80") ||
        (scheme == "https" && port == "443"))
    var pe = path.length
    while (pe > 0 && path.charAt(pe - 1) == '/') pe -= 1
    path = path.substring(0, pe)
    val kept = new java.util.ArrayList[UTF8String]()
    if (query.nonEmpty) {
      var i = 0
      while (i <= query.length) {
        val amp = query.indexOf('&', i)
        val end = if (amp < 0) query.length else amp
        if (end > i) {
          val p = query.substring(i, end)
          val eq = p.indexOf('=')
          val key = (if (eq < 0) p else p.substring(0, eq)).toLowerCase
          if (!key.startsWith("utm_") && !dropSet.contains(key))
            kept.add(UTF8String.fromString(p))
        }
        i = end + 1
      }
    }
    java.util.Collections.sort(kept) // UTF8String = binary order
    val out = new java.lang.StringBuilder(s.length)
    out.append(scheme).append("://").append(host)
    if (keepPort) out.append(':').append(port)
    out.append(path)
    var k = 0
    while (k < kept.size) {
      out.append(if (k == 0) '?' else '&').append(kept.get(k).toString)
      k += 1
    }
    UTF8String.fromString(out.toString)
  }

  override def nullSafeEval(v: Any): Any = canon(v.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("urlCanon", this,
      classOf[CanonicalizeUrl].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("r")
      s"""
         |UTF8String $r = $ref.canon($c);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r;
         |}
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "canonicalize_url"
}

/** Content-defined chunking (Gear/FastCDC class) — the blob-dedup
  * primitive: boundaries are picked where a rolling hash of the last bytes
  * hits a mask, so an insertion early in a blob only perturbs the chunk it
  * lands in; every later boundary RE-SYNCS and the chunks (and their
  * hashes) match again. That resynchronization is what makes chunk-set
  * overlap a usable near-duplicate signal for binary columns at corpus
  * scale — fixed-size blocks lose alignment forever after one inserted
  * byte.
  *
  * Gear table: 256 splitmix64 constants (deterministic, seed = byte
  * value); rolling state `h = (h << 1) + gear(b)`; boundary when the top
  * `avgBits` bits of h are zero (expected chunk ≈ 2^avgBits bytes),
  * subject to min/max chunk bounds (max forces a cut, min suppresses
  * early cuts; both also bound memory). Chunk ids are FNV-1a-64 +
  * splitmix finalizer over the chunk bytes ([[Hash64.hash]]'s byte
  * twin). */
object CdcChunker {
  private val gear: Array[Long] = Array.tabulate(256) { i =>
    var z = i.toLong + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Chunk boundary END offsets (exclusive), always ending at length. */
  def boundaries(bytes: Array[Byte], minSize: Int, avgBits: Int,
                 maxSize: Int): Array[Int] = {
    val mask = ~((1L << (64 - avgBits)) - 1L) // top avgBits bits
    val out = new scala.collection.mutable.ArrayBuffer[Int]()
    val n = bytes.length
    var start = 0
    while (start < n) {
      var h = 0L
      var i = start
      var cut = -1
      val hardEnd = math.min(start + maxSize, n)
      while (i < hardEnd && cut < 0) {
        h = (h << 1) + gear(bytes(i) & 0xff)
        i += 1
        if (i - start >= minSize && (h & mask) == 0L) cut = i
      }
      val end = if (cut > 0) cut else hardEnd
      out += end
      start = end
    }
    out.toArray
  }

  /** Chunk hashes of a blob (one long per chunk, in order). Empty input →
    * empty array. */
  def chunkHashes(bytes: Array[Byte], minSize: Int, avgBits: Int,
                  maxSize: Int): Array[Long] = {
    val ends = boundaries(bytes, minSize, avgBits, maxSize)
    val out = new Array[Long](ends.length)
    var start = 0
    var i = 0
    while (i < ends.length) {
      out(i) = Hash64.hashByteRange(bytes, start, ends(i))
      start = ends(i)
      i += 1
    }
    out
  }

  /** Boxed-array form for the codegen call (ArrayData wants a fresh
    * GenericArrayData; primitive longs are fine). */
  def chunkArray(bytes: Array[Byte], minSize: Int, avgBits: Int,
                 maxSize: Int): org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      chunkHashes(bytes, minSize, avgBits, maxSize))
}

/** Codegen wrapper: `cdc_chunks(bin, min, avgBits, max)` → array<long> of
  * content-defined chunk hashes. One scan-local pass per blob; the blob
  * bytes never leave the scan — only 8-byte chunk ids flow into the dedup
  * join. */
case class CdcChunks(child: Expression, minSize: Int, avgBits: Int,
                     maxSize: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(minSize >= 1 && maxSize >= minSize,
    s"cdc_chunks: need 1 <= minSize <= maxSize, got $minSize/$maxSize")
  require(avgBits >= 1 && avgBits <= 48,
    s"cdc_chunks: avgBits out of range: $avgBits")
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    CdcChunker.chunkArray(v.asInstanceOf[Array[Byte]], minSize, avgBits, maxSize)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CdcChunker.chunkArray($c, $minSize, $avgBits, $maxSize)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "cdc_chunks"
}
