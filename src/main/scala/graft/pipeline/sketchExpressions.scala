package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Sketching as single-pass Catalyst expressions.
 *
 * The pure-builtin formulations (64 aggregate() calls for SimHash, k
 * transform() chains for MinHash, bands*planes*dims expression evals for
 * the hyperplane sketch) are O(bits * tokens) catalyst-node evaluations per
 * row; these expressions do the same math in one tight JVM loop per row —
 * measured ~5-10x faster at sf0.1 — while staying deterministic and
 * identical in output to the reference formulations they replaced.
 */

/** xxhash64-compatible avalanche of a string's UTF-8 bytes. We reuse Spark's
  * own XxHash64 seed/algorithm so values match `functions.xxhash64`. */
private object SketchHash {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  // precompiled: String.split has no fast path for multi-char regexes, so
  // an inline "\\s+" recompiles the pattern ON EVERY ROW of every
  // single-pass text expression
  private val Ws = java.util.regex.Pattern.compile("\\s+")
  def hash(bytes: Array[Byte]): Long =
    XXH64.hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
      bytes.length, 42L)

  /** Whitespace tokenization of lowercased trimmed text (parity with
    * split(lower(trim(text)), "\\s+")). limit = -1: Spark's split keeps
    * trailing empty strings (a doc ending in '\n' — which the space-only
    * trim preserves — tokenizes to [..., ""] on the builtin side), while
    * Java's default split drops them; the expression and builtin paths
    * must count the same tokens or threshold gates disagree at the
    * boundary. */
  def tokenize(text: UTF8String): Array[String] = {
    val lowered = text.trim().toLowerCase.toString
    if (lowered.isEmpty) Array("") else Ws.split(lowered, -1)
  }

  /** The SAME case fold [[tokenize]] (and SQL `lower`) applies to the
    * text side. Probe sets MUST fold through this, not String.toLowerCase:
    * the latter is default-locale (Turkish dotless-i turns "III" into
    * "ııı"), so a probe entry folded with it can silently never match the
    * UTF8String-folded token stream. */
  def foldCase(s: String): String =
    UTF8String.fromString(s).toLowerCase.toString

  def hash(s: String): Long = hash(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
}

/** 64-bit SimHash over whitespace tokens — one pass over the tokens. */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any = {
    val tokens = SketchHash.tokenize(input.asInstanceOf[UTF8String])
    val counts = new Array[Int](64)
    var t = 0
    while (t < tokens.length) {
      val h = SketchHash.hash(tokens(t))
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
      t += 1
    }
    var fp = 0L
    var i = 0
    while (i < 64) {
      if (counts(i) > 0) fp |= (1L << i)
      i += 1
    }
    fp
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** MinHash signature over word n-gram shingles — one pass per shingle.
  * Output: array<long> of k slots; identical to the (a*h+b) mod p builtin
  * formulation over 31-bit shingle hashes. */
case class MinHashExpr(child: Expression, shingleN: Int, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(shingleN >= 1 && k >= 1, s"need shingleN >= 1 and k >= 1 (got $shingleN, $k)")

  private final val P = 2147483647L // 2^31 - 1

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any = {
    val tokens = SketchHash.tokenize(input.asInstanceOf[UTF8String])
    val mins = Array.fill(k)(Long.MaxValue)
    val seen = new java.util.HashSet[String]()
    var i = 0
    while (i + shingleN <= tokens.length) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < shingleN) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(i + j))
        j += 1
      }
      val shingle = sb.toString
      if (seen.add(shingle)) {
        val h = {
          val raw = SketchHash.hash(shingle)
          val m = raw % P
          if (m < 0) m + P else m
        }
        var s = 0
        while (s < k) {
          val a = 2L * s + 1
          val b = 104729L * (s + 1)
          val v = (h * a + b) % P
          if (v < mins(s)) mins(s) = v
          s += 1
        }
      }
      i += 1
    }
    if (mins(0) == Long.MaxValue) java.util.Arrays.fill(mins, 0L)
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Distinct word n-gram shingles as SORTED xxhash64 values — one pass, no
  * intermediate string arrays. Set-identical to
  * `transform(array_distinct(wordShingles(text, n)), xxhash64)` (ordering
  * aside); sorted output enables merge-walk set ops ([[SortedJaccardExpr]]).
  * The builtin chain (split -> transform -> slice -> concat_ws ->
  * array_distinct) generates codegen past the JIT method-size threshold and
  * runs interpreted at scale; this is one small JIT-friendly loop. */
case class HashedShinglesExpr(child: Expression, shingleN: Int)
    extends UnaryExpression with CodegenFallback {
  require(shingleN >= 1, s"need shingleN >= 1 (got $shingleN)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any = {
    val tokens = SketchHash.tokenize(input.asInstanceOf[UTF8String])
    val n = tokens.length - shingleN + 1
    if (n <= 0) return new GenericArrayData(Array.emptyLongArray)
    val hashes = new Array[Long](n)
    var i = 0
    while (i < n) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < shingleN) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(i + j))
        j += 1
      }
      hashes(i) = SketchHash.hash(sb.toString)
      i += 1
    }
    java.util.Arrays.sort(hashes)
    // dedup in place (sorted)
    var w = 1
    i = 1
    while (i < n) {
      if (hashes(i) != hashes(w - 1)) { hashes(w) = hashes(i); w += 1 }
      i += 1
    }
    new GenericArrayData(if (w == n) hashes else java.util.Arrays.copyOf(hashes, w))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Jaccard similarity of two SORTED distinct long arrays by merge walk —
  * O(n+m), no per-row hash sets. Null when the union is empty. */
case class SortedJaccardExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData].toLongArray()
    val b = r.asInstanceOf[ArrayData].toLongArray()
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      val x = a(i); val y = b(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = a.length + b.length - inter
    if (union == 0) null else inter.toDouble / union
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Random-hyperplane sign sketch: `planes` bits per band, `bands` bands,
  * one pass over the vector per (band, plane). Plane components are the
  * same deterministic hash-derived values as the builtin formulation.
  * Output: array<long> of band keys. */
case class HyperplaneSketchExpr(child: Expression, planes: Int, bands: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  // component(p, i) = hash-derived uniform in [-1, 1)
  private def component(p: Int, i: Int): Double = {
    val h = SketchHash.hash(s"plane:$p:$i")
    val m = h % 1000003L
    val mm = if (m < 0) m + 1000003L else m
    mm.toDouble / 500001.5 - 1.0
  }

  @transient private lazy val componentCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Double]]()

  private def planeRow(p: Int, dims: Int): Array[Double] = {
    var arr = componentCache.get(p)
    if (arr == null || arr.length < dims) {
      arr = Array.tabulate(dims)(i => component(p, i))
      componentCache.put(p, arr)
    }
    arr
  }

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val dims = vec.numElements()
    val values = new Array[Double](dims)
    val et = child.dataType.asInstanceOf[ArrayType].elementType
    var i = 0
    while (i < dims) {
      values(i) = et match {
        case FloatType  => vec.getFloat(i).toDouble
        case DoubleType => vec.getDouble(i)
        case LongType   => vec.getLong(i).toDouble
        case IntegerType => vec.getInt(i).toDouble
        case other => throw new IllegalArgumentException(s"unsupported element type $other")
      }
      i += 1
    }
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var key = 0L
      var p = 0
      while (p < planes) {
        val row = planeRow(b * planes + p, dims)
        var dot = 0.0
        var d = 0
        while (d < dims) { dot += values(d) * row(d); d += 1 }
        if (dot >= 0) key |= (1L << p)
        p += 1
      }
      keys(b) = key
      b += 1
    }
    new GenericArrayData(keys)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Top-n nearest centroids (by cosine) of a vector — one JVM pass instead of
  * a width-nCells literal expression tree (which churns Janino codegen).
  * Output: array<int> of the n best cell indices, best first. */
case class NearestCellsExpr(child: Expression, centroids: Seq[Seq[Double]], n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  @transient private lazy val cents: Array[Array[Double]] =
    centroids.map(_.toArray).toArray
  @transient private lazy val centNorms: Array[Double] =
    cents.map(c => math.sqrt(c.map(x => x * x).sum))

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val et = child.dataType.asInstanceOf[ArrayType].elementType
    val dims = vec.numElements()
    val v = new Array[Double](dims)
    var i = 0
    while (i < dims) {
      v(i) = et match {
        case FloatType   => vec.getFloat(i).toDouble
        case DoubleType  => vec.getDouble(i)
        case IntegerType => vec.getInt(i).toDouble
        case LongType    => vec.getLong(i).toDouble
        case other => throw new IllegalArgumentException(s"unsupported element type $other")
      }
      i += 1
    }
    val vNorm = math.sqrt(v.map(x => x * x).sum)
    val scores = new Array[Double](cents.length)
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var dot = 0.0
      var d = 0
      val lim = math.min(dims, cent.length)
      while (d < lim) { dot += v(d) * cent(d); d += 1 }
      scores(c) = dot / (vNorm * centNorms(c))
      c += 1
    }
    val order = scores.indices.sortBy(i => (-scores(i), i)).take(n).toArray
    new GenericArrayData(order)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Product-quantization encoder (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011): the vector is split into
  * `codebooks.size` equal coordinate blocks and each block is replaced by
  * the index of its nearest (L2) sub-centroid. Output: array<int> of M
  * codes — at M=8, K=16 that is 8 small ints standing in for 64 floats, the
  * compression that lets a 100 TB embedding corpus scan from memory-resident
  * codes. One JVM pass; codebooks ride in the plan (M*K*subDim doubles). */
case class PqEncodeExpr(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with CodegenFallback {
  // empty codebooks would be a per-row divide-by-zero on every executor
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "pqEncode needs at least one non-empty codebook per subspace")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  @transient private lazy val books: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val et = child.dataType.asInstanceOf[ArrayType].elementType
    val dims = vec.numElements()
    val m = books.length
    val subDim = dims / m
    // decode the vector ONCE per row: the et dispatch + ArrayData accessor
    // in the centroid loop cost K re-reads per element (K=256 codebooks =
    // 256x the memory traffic); every sibling expression buffers first
    val xs = new Array[Double](dims)
    var vi = 0
    while (vi < dims) {
      xs(vi) = et match {
        case FloatType   => vec.getFloat(vi).toDouble
        case DoubleType  => vec.getDouble(vi)
        case IntegerType => vec.getInt(vi).toDouble
        case LongType    => vec.getLong(vi).toDouble
        case other => throw new IllegalArgumentException(s"unsupported element type $other")
      }
      vi += 1
    }
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val book = books(s)
      val base = s * subDim
      var best = 0
      var bestDist = Double.MaxValue
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var dist = 0.0
        var d = 0
        while (d < subDim && d < cent.length) {
          val diff = xs(base + d) - cent(d)
          dist += diff * diff
          d += 1
        }
        if (dist < bestDist) { bestDist = dist; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Asymmetric-distance scoring against precomputed per-query lookup tables:
  * for each query q, approx cosine(q, x) = Σ_m lut(q)(m)(code_m) /
  * (qNorm(q) * |x̂|), where x̂ is the PQ reconstruction and |x̂|² =
  * Σ_m norm2(m)(code_m) exactly (subspaces are disjoint coordinate blocks).
  * One pass per row over M codes and Q queries — M*Q adds/lookups instead
  * of D*Q multiplies against the raw vector, on 1/32nd the bytes.
  * Output: array<double>, one approximate cosine per query. */
case class PqAdcScoresExpr(child: Expression,
                           luts: Seq[Seq[Seq[Double]]],
                           norm2: Seq[Seq[Double]],
                           qNorms: Seq[Double])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = child.nullable

  @transient private lazy val lutArr: Array[Array[Array[Double]]] =
    luts.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val norm2Arr: Array[Array[Double]] =
    norm2.map(_.toArray).toArray
  @transient private lazy val qNormArr: Array[Double] = qNorms.toArray

  override def nullSafeEval(input: Any): Any = {
    val codes = input.asInstanceOf[ArrayData]
    val m = codes.numElements()
    var rec2 = 0.0
    var s = 0
    while (s < m) {
      rec2 += norm2Arr(s)(codes.getInt(s))
      s += 1
    }
    val recNorm = math.sqrt(rec2)
    val out = new Array[Double](lutArr.length)
    var q = 0
    while (q < lutArr.length) {
      var dot = 0.0
      s = 0
      while (s < m) {
        dot += lutArr(q)(s)(codes.getInt(s))
        s += 1
      }
      val denom = qNormArr(q) * recNorm
      out(q) = if (denom == 0.0) 0.0 else dot / denom
      q += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Single-pair ADC score: the [[PqAdcScoresExpr]] arithmetic for ONE
  * (row, query) pairing, with the query picked per row by the `qIdx`
  * child column. This is the IVF-PQ shape: after the coarse quantizer has
  * joined each row to only the queries probing its cell, scoring all Q
  * queries per row ([[PqAdcScoresExpr]]'s contract) would throw away the
  * probe pruning — this evaluates exactly the paired query's add-chain,
  * so candidate scoring is O(m) per surviving pair. */
case class PqAdcPairScoreExpr(codesExpr: Expression, qIdxExpr: Expression,
                              luts: Seq[Seq[Seq[Double]]],
                              norm2: Seq[Seq[Double]],
                              qNorms: Seq[Double])
    extends BinaryExpression with CodegenFallback {

  override def left: Expression = codesExpr
  override def right: Expression = qIdxExpr
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = codesExpr.nullable || qIdxExpr.nullable

  @transient private lazy val lutArr: Array[Array[Array[Double]]] =
    luts.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val norm2Arr: Array[Array[Double]] =
    norm2.map(_.toArray).toArray
  @transient private lazy val qNormArr: Array[Double] = qNorms.toArray

  override def nullSafeEval(codesAny: Any, qIdxAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val q = qIdxAny.asInstanceOf[Int]
    val m = codes.numElements()
    var rec2 = 0.0
    var dot = 0.0
    var s = 0
    while (s < m) {
      val c = codes.getInt(s)
      rec2 += norm2Arr(s)(c)
      dot += lutArr(q)(s)(c)
      s += 1
    }
    val denom = qNormArr(q) * math.sqrt(rec2)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(codesExpr = l, qIdxExpr = r)
}

/** Winnowing fingerprints (Schleimer, Wilkerson & Aiken, "Winnowing: Local
  * Algorithms for Document Fingerprinting", SIGMOD 2003 — the MOSS
  * algorithm): hash every k-token gram, slide a window of `w` consecutive
  * gram hashes, select each window's minimum (rightmost on ties — the
  * robust-winnowing rule, so selection depends only on window content).
  * Output: the sorted distinct selected hashes.
  *
  * The guarantee the spec pins: any shared token run of >= w+k-1 tokens
  * contains a full window in both documents, and that window selects the
  * same hash — so sharing a long-enough span ALWAYS shares a fingerprint,
  * while storage is ~1/w of the full gram set (the density winnowing was
  * invented for). Documents shorter than k tokens hash as one whole-doc
  * gram. One pass per row, scan-local. */
case class WinnowExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1 && w >= 1, s"need k >= 1 and w >= 1 (got k=$k, w=$w)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any = {
    val toks = SketchHash.tokenize(input.asInstanceOf[UTF8String])
    val grams: Array[Long] =
      if (toks.length < k) Array(SketchHash.hash(toks.mkString(" ")))
      else Array.tabulate(toks.length - k + 1) { i =>
        SketchHash.hash(toks.slice(i, i + k).mkString(" "))
      }
    val selected = new java.util.TreeSet[java.lang.Long]()
    if (grams.length <= w) {
      // fewer grams than a window: select the one global (rightmost) min
      var best = 0
      var i = 1
      while (i < grams.length) { if (grams(i) <= grams(best)) best = i; i += 1 }
      selected.add(grams(best))
      ()
    } else {
      var start = 0
      while (start + w <= grams.length) {
        var best = start
        var i = start + 1
        while (i < start + w) { if (grams(i) <= grams(best)) best = i; i += 1 }
        selected.add(grams(best))
        start += 1
      }
    }
    val out = new Array[Long](selected.size)
    var j = 0
    selected.forEach { h => out(j) = h.longValue; j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Johnson–Lindenstrauss random projection to `outDims` components — the
  * same hash-derived pseudo-random matrix family as [[HyperplaneSketchExpr]]
  * but in its own `proj:` namespace (so projection axes never correlate with
  * the LSH planes) and emitting the full dot products rather than sign bits.
  * Components scale by 1/sqrt(outDims), the JL convention that keeps
  * expected squared norms comparable across output widths. One JVM pass per
  * row: O(outDims * dims) multiplies, no catalyst-node churn. */
case class RandomProjectExpr(child: Expression, outDims: Int)
    extends UnaryExpression with CodegenFallback {
  require(outDims >= 1, s"need outDims >= 1 (got $outDims)")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = child.nullable

  private def component(p: Int, i: Int): Double = {
    val h = SketchHash.hash(s"proj:$p:$i")
    val m = h % 1000003L
    val mm = if (m < 0) m + 1000003L else m
    mm.toDouble / 500001.5 - 1.0
  }

  @transient private lazy val rowCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Double]]()

  private def projRow(p: Int, dims: Int): Array[Double] = {
    var arr = rowCache.get(p)
    if (arr == null || arr.length < dims) {
      arr = Array.tabulate(dims)(i => component(p, i))
      rowCache.put(p, arr)
    }
    arr
  }

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val dims = vec.numElements()
    val values = new Array[Double](dims)
    val et = child.dataType.asInstanceOf[ArrayType].elementType
    var i = 0
    while (i < dims) {
      values(i) = et match {
        case FloatType   => vec.getFloat(i).toDouble
        case DoubleType  => vec.getDouble(i)
        case LongType    => vec.getLong(i).toDouble
        case IntegerType => vec.getInt(i).toDouble
        case other => throw new IllegalArgumentException(s"unsupported element type $other")
      }
      i += 1
    }
    val scale = 1.0 / math.sqrt(outDims.toDouble)
    val out = new Array[Double](outDims)
    var p = 0
    while (p < outDims) {
      val row = projRow(p, dims)
      var dot = 0.0
      var d = 0
      while (d < dims) { dot += values(d) * row(d); d += 1 }
      out(p) = dot * scale
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Shared numeric-element accessor for the single-pass vector expressions:
  * one dispatch, one supported-type domain (the per-expression match blocks
  * had already drifted apart). Widening matches the `cast("double")` the
  * replaced builtin formulations applied per element (decimal included —
  * Spark's decimal→double cast is Decimal.toDouble). Unsupported element
  * types now fail at ANALYSIS time via [[VecGetter.check]] instead of
  * lazily per-task at executor eval. */
private object VecGetter {
  def supports(dt: DataType): Boolean = dt match {
    case DoubleType | FloatType | LongType | IntegerType | ShortType |
         ByteType | _: DecimalType => true
    case _ => false
  }

  /** Analysis-time gate shared by the vector expressions: every child must
    * be an array of a supported numeric element type. */
  def check(name: String, children: Seq[Expression])
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    val bad = children.map(_.dataType).find {
      case ArrayType(et, _) => !supports(et)
      case _                => true
    }
    bad match {
      case Some(dt) => TypeCheckResult.TypeCheckFailure(
        s"$name requires array arguments of numeric elements, got ${dt.catalogString}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  def of(dt: DataType): (ArrayData, Int) => Double = dt match {
    case DoubleType  => (ad, i) => ad.getDouble(i)
    case FloatType   => (ad, i) => ad.getFloat(i).toDouble
    case LongType    => (ad, i) => ad.getLong(i).toDouble
    case IntegerType => (ad, i) => ad.getInt(i).toDouble
    case ShortType   => (ad, i) => ad.getShort(i).toDouble
    case ByteType    => (ad, i) => ad.getByte(i).toDouble
    case d: DecimalType => (ad, i) => ad.getDecimal(i, d.precision, d.scale).toDouble
    case other => throw new IllegalArgumentException(
      s"unsupported numeric array element type $other")
  }

  /** The same element-as-double access as [[of]], as a Java source snippet
    * over an ArrayData variable `arr` and an int index variable `i` — the
    * codegen twin; keep the two in lockstep. */
  def javaGet(dt: DataType, arr: String, i: String): String = dt match {
    case DoubleType  => s"$arr.getDouble($i)"
    case FloatType   => s"(double) $arr.getFloat($i)"
    case LongType    => s"(double) $arr.getLong($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case ShortType   => s"(double) $arr.getShort($i)"
    case ByteType    => s"(double) $arr.getByte($i)"
    case d: DecimalType => s"$arr.getDecimal($i, ${d.precision}, ${d.scale}).toDouble()"
    case other => throw new IllegalArgumentException(
      s"unsupported numeric array element type $other")
  }
}

/** Exact cosine similarity of two numeric arrays — ONE tight loop per row,
  * replacing the three interpreted higher-order-function traversals
  * (zip_with products array + two aggregate() norm passes) that dominated
  * every scored ANN join. BIT-IDENTICAL to the builtin formulation it
  * replaces: each product/square is rounded once and summed in index order
  * (same double ops, same order), and the null/zero-norm semantics
  * reproduce the SQL three-valued logic of
  * `when(na === 0 || nb === 0, 0.0).otherwise(dot / (sqrt(na)*sqrt(nb)))`
  * over aggregate()'s null propagation (null array, null element, or
  * zip_with length-mismatch padding => null through that term). */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VecGetter.check(prettyName, Seq(left, right))

  @transient private lazy val getL =
    VecGetter.of(left.dataType.asInstanceOf[ArrayType].elementType)
  @transient private lazy val getR =
    VecGetter.of(right.dataType.asInstanceOf[ArrayType].elementType)

  /** Σ v_i² in index order; null (as in aggregate()) when the array or any
    * element is null. */
  private def norm2(ad: ArrayData, get: (ArrayData, Int) => Double): java.lang.Double = {
    if (ad == null) return null
    var acc = 0.0
    var i = 0
    val n = ad.numElements()
    while (i < n) {
      if (ad.isNullAt(i)) return null
      val v = get(ad, i)
      acc += v * v
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input).asInstanceOf[ArrayData]
    val b = right.eval(input).asInstanceOf[ArrayData]
    val na = norm2(a, getL)
    val nb = norm2(b, getR)
    // when(na === 0 || nb === 0, 0.0): the OR is true iff either norm is a
    // NON-NULL zero (null || true = true, null || false = null != true)
    if ((na != null && na.doubleValue == 0.0) ||
        (nb != null && nb.doubleValue == 0.0)) return 0.0
    // otherwise-branch: any null term (null array/element, or zip_with's
    // null padding on a length mismatch) nulls the whole expression
    if (na == null || nb == null || a.numElements() != b.numElements()) return null
    var dot = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      dot += getL(a, i) * getR(b, i)
      i += 1
    }
    dot / (math.sqrt(na.doubleValue) * math.sqrt(nb.doubleValue))
  }

  /** Codegen twin of [[eval]] — same double ops in the same order, same
    * null/zero-norm branches, so interpreted and generated paths are
    * bit-identical (VectorExprParitySpec). Participating in whole-stage
    * codegen keeps every scored-join projection in one generated span
    * (the CodegenFallback it replaces broke the span at this node). */
  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val ad = classOf[ArrayData].getName
    val a = ctx.freshName("cosA"); val b = ctx.freshName("cosB")
    val naNull = ctx.freshName("naNull"); val na = ctx.freshName("na")
    val nbNull = ctx.freshName("nbNull"); val nb = ctx.freshName("nb")
    val i = ctx.freshName("i"); val n = ctx.freshName("n")
    val v = ctx.freshName("v"); val dot = ctx.freshName("dot")
    val getA = VecGetter.javaGet(left.dataType.asInstanceOf[ArrayType].elementType, a, i)
    val getB = VecGetter.javaGet(right.dataType.asInstanceOf[ArrayType].elementType, b, i)
    ev.copy(code = code"""
      ${leftGen.code}
      ${rightGen.code}
      boolean ${ev.isNull} = true;
      double ${ev.value} = 0.0;
      $ad $a = ${leftGen.isNull} ? null : ${leftGen.value};
      $ad $b = ${rightGen.isNull} ? null : ${rightGen.value};
      boolean $naNull = true; double $na = 0.0;
      if ($a != null) {
        $naNull = false;
        int $n = $a.numElements();
        for (int $i = 0; $i < $n; $i++) {
          if ($a.isNullAt($i)) { $naNull = true; break; }
          double $v = $getA;
          $na += $v * $v;
        }
      }
      boolean $nbNull = true; double $nb = 0.0;
      if ($b != null) {
        $nbNull = false;
        int $n = $b.numElements();
        for (int $i = 0; $i < $n; $i++) {
          if ($b.isNullAt($i)) { $nbNull = true; break; }
          double $v = $getB;
          $nb += $v * $v;
        }
      }
      if ((!$naNull && $na == 0.0) || (!$nbNull && $nb == 0.0)) {
        ${ev.isNull} = false;
        ${ev.value} = 0.0;
      } else if (!$naNull && !$nbNull && $a.numElements() == $b.numElements()) {
        double $dot = 0.0;
        int $n = $a.numElements();
        for (int $i = 0; $i < $n; $i++) {
          $dot += ($getA) * ($getB);
        }
        ${ev.isNull} = false;
        ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
      }
    """)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Euclidean distance from a numeric array to a fixed center — single-pass
  * replacement for `sqrt(aggregate(zip_with(vec, centerLit, (v,m) =>
  * (v-m)*(v-m)), 0.0, _+_))`, bit-identical: per-element (v-m) rounded,
  * squared, summed in index order, then sqrt. Null array / null element /
  * length mismatch (zip_with null padding) => null, as in the builtin. */
case class EuclidDistExpr(child: Expression, center: Seq[Double])
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VecGetter.check(prettyName, Seq(child))

  @transient private lazy val c = center.toArray
  @transient private lazy val get: (ArrayData, Int) => Double =
    VecGetter.of(child.dataType.asInstanceOf[ArrayType].elementType)

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    if (vec.numElements() != c.length) return null
    var acc = 0.0
    var i = 0
    while (i < c.length) {
      if (vec.isNullAt(i)) return null
      val d = get(vec, i) - c(i)
      acc += d * d
      i += 1
    }
    math.sqrt(acc)
  }

  /** Codegen twin of [[nullSafeEval]] — same per-element (v−m) rounding,
    * squaring and index-order summation, so generated and interpreted
    * results are bit-identical; keeps the distance projection inside the
    * surrounding whole-stage-codegen span. */
  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, vec => {
      val cRef = ctx.addReferenceObj("center", c, "double[]")
      val acc = ctx.freshName("acc"); val bad = ctx.freshName("bad")
      val i = ctx.freshName("i"); val d = ctx.freshName("d")
      val getV = VecGetter.javaGet(
        child.dataType.asInstanceOf[ArrayType].elementType, vec, i)
      s"""
      ${ev.isNull} = true;
      if ($vec.numElements() == $cRef.length) {
        double $acc = 0.0;
        boolean $bad = false;
        for (int $i = 0; $i < $cRef.length; $i++) {
          if ($vec.isNullAt($i)) { $bad = true; break; }
          double $d = ($getV) - $cRef[$i];
          $acc += $d * $d;
        }
        if (!$bad) {
          ${ev.isNull} = false;
          ${ev.value} = java.lang.Math.sqrt($acc);
        }
      }
      """
    })

  override protected def withNewChildInternal(ch: Expression): Expression = copy(child = ch)
}

/** Growable per-dimension exact-sum buffer: counts[i] = rows where dim i
  * exists, sums[i] = exact BigDecimal sum of its non-null values (null until
  * the first value — matching SQL sum's all-null => null). */
final class VecDimStatsBuffer {
  var sums: Array[java.math.BigDecimal] = _
  var counts: Array[Long] = _
  def ensure(n: Int): Unit = {
    if (counts == null) {
      sums = new Array[java.math.BigDecimal](n)
      counts = new Array[Long](n)
    } else if (counts.length < n) {
      sums = java.util.Arrays.copyOf(sums, n)
      counts = java.util.Arrays.copyOf(counts, n)
    }
  }
}

/**
 * Per-dimension exact sums + counts of an array column in ONE pass — the
 * Lloyd/centroid building block. Replaces `posexplode + groupBy(pos) +
 * sum(cast(decimal(38,15)))`, which paid an N×dims row explosion, a shuffle
 * of all exploded rows, and a per-update unsafe-buffer round trip of a
 * precision-38 decimal. The BigDecimal arithmetic here is EXACTLY the
 * decimal(38,15) cast-and-sum it replaces (float/double -> decimal(38,15)
 * is `new BigDecimal(Double.toString(v)).setScale(15, HALF_UP)` — parity
 * probed over the full corpus in DecimalCastProbe — and BigDecimal addition
 * is the same exact, associative sum), so the downstream `sum / count`
 * division, left IN Catalyst by the callers, yields bit-identical means
 * under any partitioning.
 *
 * Output: struct<sums: array<decimal(38,15)>, counts: array<long>>; null
 * for a group that saw no arrays (sum-of-nothing parity).
 */
case class VecDimStatsAgg(child: Expression,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[VecDimStatsBuffer]
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def dataType: DataType = StructType(Seq(
    StructField("sums", ArrayType(DecimalType(38, 15), containsNull = true)),
    StructField("counts", ArrayType(LongType, containsNull = false))))
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dim_stats"

  // element -> decimal(38,15) with CAST parity per source type: float/double
  // go through the shortest-string double repr + HALF_UP at scale 15
  // (probed in DecimalCastProbe); integral types are exact (Spark's
  // long->decimal cast never routes through double, so neither do we —
  // values above 2^53 must not lose precision)
  // a NaN/Infinity element would otherwise surface as a raw
  // NumberFormatException from BigDecimal parsing — name the aggregate and
  // the dimension instead (mirrors the precision-overflow guard below)
  private def finiteOr(v: Double, i: Int): Double = {
    if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v))
      throw new ArithmeticException(
        s"vec_dim_stats: non-finite element $v at dimension $i")
    v
  }

  @transient private lazy val toDec: (ArrayData, Int) => java.math.BigDecimal =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case DoubleType => (ad, i) =>
        new java.math.BigDecimal(java.lang.Double.toString(finiteOr(ad.getDouble(i), i)))
          .setScale(15, java.math.RoundingMode.HALF_UP)
      case FloatType => (ad, i) =>
        new java.math.BigDecimal(java.lang.Double.toString(finiteOr(ad.getFloat(i).toDouble, i)))
          .setScale(15, java.math.RoundingMode.HALF_UP)
      case LongType    => (ad, i) => java.math.BigDecimal.valueOf(ad.getLong(i)).setScale(15)
      case IntegerType => (ad, i) => java.math.BigDecimal.valueOf(ad.getInt(i).toLong).setScale(15)
      case ShortType   => (ad, i) => java.math.BigDecimal.valueOf(ad.getShort(i).toLong).setScale(15)
      case ByteType    => (ad, i) => java.math.BigDecimal.valueOf(ad.getByte(i).toLong).setScale(15)
      // exact: scale-up for s <= 15, HALF_UP rounding above — the same
      // decimal(p,s) -> decimal(38,15) cast the posexplode formulation paid
      case d: DecimalType => (ad, i) =>
        ad.getDecimal(i, d.precision, d.scale).toJavaBigDecimal
          .setScale(15, java.math.RoundingMode.HALF_UP)
      case other => throw new IllegalArgumentException(
        s"vec_dim_stats: unsupported element type $other")
    }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VecGetter.check(prettyName, Seq(child))

  override def createAggregationBuffer(): VecDimStatsBuffer = new VecDimStatsBuffer

  override def update(buffer: VecDimStatsBuffer, input: InternalRow): VecDimStatsBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val ad = v.asInstanceOf[ArrayData]
      val n = ad.numElements()
      buffer.ensure(n)
      var i = 0
      while (i < n) {
        buffer.counts(i) += 1
        if (!ad.isNullAt(i)) {
          val bd = toDec(ad, i)
          if (bd.precision > 38) throw new ArithmeticException(
            s"vec_dim_stats: element at $i overflows decimal(38,15)")
          buffer.sums(i) = if (buffer.sums(i) == null) bd else buffer.sums(i).add(bd)
        }
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: VecDimStatsBuffer, other: VecDimStatsBuffer): VecDimStatsBuffer = {
    if (other.counts != null) {
      buffer.ensure(other.counts.length)
      var i = 0
      while (i < other.counts.length) {
        buffer.counts(i) += other.counts(i)
        if (other.sums(i) != null)
          buffer.sums(i) =
            if (buffer.sums(i) == null) other.sums(i)
            else buffer.sums(i).add(other.sums(i))
        i += 1
      }
    }
    buffer
  }

  override def eval(buffer: VecDimStatsBuffer): Any = {
    if (buffer.counts == null) return null
    val sums = buffer.sums.map { bd =>
      if (bd == null) null
      else org.apache.spark.sql.types.Decimal(scala.math.BigDecimal(bd), 38, 15)
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      new GenericArrayData(sums.asInstanceOf[Array[Any]]),
      new GenericArrayData(buffer.counts)))
  }

  override def serialize(buffer: VecDimStatsBuffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    val n = if (buffer.counts == null) -1 else buffer.counts.length
    out.writeInt(n)
    var i = 0
    while (i < n) {
      out.writeLong(buffer.counts(i))
      val bd = buffer.sums(i)
      if (bd == null) out.writeInt(-1)
      else {
        // scale is always 15 by construction; persist the unscaled bigint
        val bytes = bd.unscaledValue.toByteArray
        out.writeInt(bytes.length)
        out.write(bytes)
      }
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VecDimStatsBuffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new VecDimStatsBuffer
    val n = in.readInt()
    if (n >= 0) {
      buf.ensure(n)
      var i = 0
      while (i < n) {
        buf.counts(i) = in.readLong()
        val len = in.readInt()
        if (len >= 0) {
          val b = new Array[Byte](len)
          in.readFully(b)
          buf.sums(i) = new java.math.BigDecimal(new java.math.BigInteger(b), 15)
        }
        i += 1
      }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecDimStatsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecDimStatsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecDimStatsAgg =
    copy(child = newChild)
}

object sketches {
  import org.apache.spark.sql.functions.zip_with

  /** The tokenizer's locale-independent case fold, for probe/marker sets
    * built outside this file (see SketchHash.foldCase). */
  def foldMarker(s: String): String = SketchHash.foldCase(s)

  def simhash64(text: Column): Column =
    GraftBridge.column(SimHash64Expr(GraftBridge.expression(text)))

  def minhash(text: Column, shingleN: Int, k: Int): Column =
    GraftBridge.column(MinHashExpr(GraftBridge.expression(text), shingleN, k))

  def hashedShingles(text: Column, shingleN: Int): Column =
    GraftBridge.column(HashedShinglesExpr(GraftBridge.expression(text), shingleN))

  def sortedJaccard(l: Column, r: Column): Column =
    GraftBridge.column(SortedJaccardExpr(GraftBridge.expression(l), GraftBridge.expression(r)))

  def hyperplaneSketch(vec: Column, planes: Int, bands: Int): Column =
    GraftBridge.column(HyperplaneSketchExpr(GraftBridge.expression(vec), planes, bands))

  def nearestCells(vec: Column, centroids: Seq[Seq[Double]], n: Int): Column =
    GraftBridge.column(NearestCellsExpr(GraftBridge.expression(vec), centroids, n))

  def pqEncode(vec: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    GraftBridge.column(PqEncodeExpr(GraftBridge.expression(vec), codebooks))

  def pqAdcScores(codes: Column, luts: Seq[Seq[Seq[Double]]],
                  norm2: Seq[Seq[Double]], qNorms: Seq[Double]): Column =
    GraftBridge.column(PqAdcScoresExpr(GraftBridge.expression(codes), luts, norm2, qNorms))

  def pqAdcPairScore(codes: Column, qIdx: Column, luts: Seq[Seq[Seq[Double]]],
                     norm2: Seq[Seq[Double]], qNorms: Seq[Double]): Column =
    GraftBridge.column(PqAdcPairScoreExpr(GraftBridge.expression(codes),
      GraftBridge.expression(qIdx), luts, norm2, qNorms))

  def randomProject(vec: Column, outDims: Int): Column =
    GraftBridge.column(RandomProjectExpr(GraftBridge.expression(vec), outDims))

  def winnow(text: Column, k: Int, w: Int): Column =
    GraftBridge.column(WinnowExpr(GraftBridge.expression(text), k, w))

  def cosineSim(a: Column, b: Column): Column =
    GraftBridge.column(CosineSimExpr(GraftBridge.expression(a), GraftBridge.expression(b)))

  def euclidDist(vec: Column, center: Seq[Double]): Column =
    GraftBridge.column(EuclidDistExpr(GraftBridge.expression(vec), center))

  def vecDimStats(vec: Column): Column =
    GraftBridge.column(VecDimStatsAgg(GraftBridge.expression(vec))
      .toAggregateExpression())

  /** Per-dimension means from a [[vecDimStats]] struct — the division stays
    * in Catalyst (`decimal(38,15) element / bigint` then cast double), the
    * exact operator chain the posexplode formulation used, so means are
    * bit-identical to it. */
  def vecDimMeans(stats: Column): Column =
    zip_with(stats.getField("sums"), stats.getField("counts"),
      (s, c) => (s / c).cast("double"))
}
