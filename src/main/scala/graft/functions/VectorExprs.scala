package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Vector kernels as codegen'd Catalyst expressions.
  *
  * Spark's higher-order functions (`aggregate`, `transform`) evaluate their
  * lambda interpreted, per element — a 64-dim dot product inside an
  * O(n²) similarity join dominated the profile (119 s at sf0.1). This
  * expression generates a tight primitive loop inside whole-stage codegen.
  *
  * Numeric parity: the loop accumulates in ascending index order — the
  * same association as a sequential fold — so results stay bit-identical
  * to the DuckDB oracle's `list_reduce` (IEEE ops are correctly rounded;
  * only association order can differ, and it doesn't).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    DotProduct.dot(x.toDoubleArray(), y.toDoubleArray())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Sequential kernel shared by interpreted eval and tests. */
  def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = a.length
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Column builder. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))
}

/** Polynomial rolling hash over the characters of a string: a = (a·31 +
  * codepoint) mod 1e9+7, exactly the sequential fold
  * `aggregate(split(text, ''), 0, (a, c) -> (a*31 + ascii(c)) % 1000000007)`
  * — which evaluates its lambda INTERPRETED per character (2M lambda steps
  * at sf0.1 dominated c11's profile). One static call per row inside
  * whole-stage codegen; integer math, so parity with the DuckDB
  * `list_reduce` form is exact.
  */
case class RollingHash(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.roll(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollingHash.roll($c);")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  private val Mod = 1000000007L

  /** UTF-16 char loop ≡ ascii() per single-char split for BMP text (the
    * fixtures are ASCII). Static — called from generated code.
    */
  def roll(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val str = s.toString
    var a = 0L
    var i = 0
    while (i < str.length) {
      a = (a * 31L + str.charAt(i).toLong) % Mod
      i += 1
    }
    a
  }

  def apply(c: Column): Column =
    GraftBridge.column(RollingHash(GraftBridge.expression(c)))
}

/** Codegen'd Bloom-filter membership probe over a long column. The filter
  * (org.apache.spark.util.sketch.BloomFilter, built once via
  * Dataset.stat.bloomFilter) rides as a generated-class reference object —
  * one in-memory probe per row inside whole-stage codegen, no UDF boxing.
  * The pre-filter shape for decontamination at scale: rows failing the
  * probe are definitively clean; only probable hits pay the exact
  * anti-join.
  */
case class BloomMightContainLong(child: Expression,
                                 bf: org.apache.spark.util.sketch.BloomFilter)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(v: Any): Any =
    bf.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfRef = ctx.addReferenceObj("bf", bf, "org.apache.spark.util.sketch.BloomFilter")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $bfRef.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
}

object BloomMightContainLong {
  def apply(c: Column, bf: org.apache.spark.util.sketch.BloomFilter): Column =
    GraftBridge.column(BloomMightContainLong(GraftBridge.expression(c), bf))
}

/** Codegen'd hashed-linear-classifier score (C39): per class, the exact
  * BIGINT sum over word unigram + adjacent-bigram features of
  * `h60(prefix ++ feature) % 1001 - 500`, where h60 is the first 15 hex
  * digits of md5 as an integer — bit-identical to the SQL form
  * `conv(substr(md5(concat(prefix, f)), 1, 15), 16, 10) % 1001 - 500`
  * summed by `aggregate(transform(...))`. The HOF form evaluates its
  * lambda INTERPRETED per feature (3 classes × ~600 features per doc =
  * ~36M interpreted md5 expression trees at sf0.1, 5.0 s); this kernel is
  * one static call per (row, class) with a tight digest loop (addition is
  * commutative over exact longs, so fold order is irrelevant to parity).
  */
case class HashedClassScore(child: Expression, prefix: String)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "hashed_class_score"

  private lazy val prefixBytes =
    prefix.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override protected def nullSafeEval(input: Any): Any =
    HashedClassScore.score(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], prefixBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("prefix", prefixBytes, "byte[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashedClassScore.score($c, $pRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): HashedClassScore =
    copy(child = newChild)
}

object HashedClassScore {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val Underscore = "_".getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** First 15 hex digits of md5(prefix ++ a [++ '_' ++ b]) as a long:
    * 15 nibbles = the big-endian first 8 digest bytes shifted right one
    * nibble — exactly `conv(substr(md5(x), 1, 15), 16, 10)`.
    */
  private def h60(md: java.security.MessageDigest, pre: Array[Byte],
                  a: Array[Byte], b: Array[Byte]): Long = {
    md.reset()
    md.update(pre)
    md.update(a)
    if (b != null) { md.update(Underscore); md.update(b) }
    val d = md.digest()
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Static — called from generated code. */
  def score(text: org.apache.spark.unsafe.types.UTF8String,
            prefix: Array[Byte]): Long = {
    // limit -1 keeps trailing empty tokens, matching split(text, ' ')
    val words = text.toString.split(" ", -1)
    val wb = new Array[Array[Byte]](words.length)
    var i = 0
    while (i < words.length) {
      wb(i) = words(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      i += 1
    }
    val md = md5.get()
    var s = 0L
    i = 0
    while (i < wb.length) {
      s += h60(md, prefix, wb(i), null) % 1001L - 500L
      if (i + 1 < wb.length) s += h60(md, prefix, wb(i), wb(i + 1)) % 1001L - 500L
      i += 1
    }
    s
  }

  def apply(c: Column, prefix: String): Column =
    GraftBridge.column(HashedClassScore(GraftBridge.expression(c), prefix))
}

/** Codegen'd positional word-shingle hashes (C24/C40): for text split on
  * single spaces, every `n`-word window's 60-bit md5 lane —
  * bit-identical to
  * `transform(sequence(1, size(w)-n+1), i -> conv(substr(md5(concat(
  * prefix, concat_ws(' ', w[i..i+n-1]))), 1, 15), 16, 10))` — as ONE
  * array-returning call per row. The HOF form pays an interpreted
  * expression tree per shingle (~1.5M at sf0.1, the dominant cost of the
  * passage-dedup pipeline); this kernel digests each window in a tight
  * loop, reusing the per-word byte arrays across the n windows that
  * contain them. Returns an empty array when the text has fewer than n
  * words.
  */
case class WordShingleHashes(child: Expression, n: Int, prefix: String)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, false)
  override def prettyName: String = "word_shingle_hashes"

  private lazy val prefixBytes =
    prefix.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override protected def nullSafeEval(input: Any): Any =
    WordShingleHashes.hashes(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n, prefixBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("prefix", prefixBytes, "byte[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingleHashes.hashes($c, $n, $pRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingleHashes =
    copy(child = newChild)
}

object WordShingleHashes {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val Space = " ".getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** Static — called from generated code. */
  def hashes(text: org.apache.spark.unsafe.types.UTF8String,
             n: Int, prefix: Array[Byte]): ArrayData = {
    val words = text.toString.split(" ", -1)
    val m = words.length - n + 1
    if (m <= 0) return ArrayData.toArrayData(Array.emptyLongArray)
    val wb = new Array[Array[Byte]](words.length)
    var i = 0
    while (i < words.length) {
      wb(i) = words(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      i += 1
    }
    val md = md5.get()
    val out = new Array[Long](m)
    i = 0
    while (i < m) {
      md.reset()
      md.update(prefix)
      var k = 0
      while (k < n) {
        if (k > 0) md.update(Space)
        md.update(wb(i + k))
        k += 1
      }
      val d = md.digest()
      var v = 0L
      var j = 0
      while (j < 8) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
      out(i) = v >>> 4
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  def apply(c: Column, n: Int, prefix: String): Column =
    GraftBridge.column(WordShingleHashes(GraftBridge.expression(c), n, prefix))
}

/** Codegen'd per-document SimHash signature (C3): for text split on
  * single spaces, hash every word (60-bit md5 lane, `prefix`-salted),
  * accumulate the ±1 per-bit votes, and assemble the `bits`-bit
  * signature — integer-exact equal to the explode → 32-column groupBy →
  * assemble pipeline (addition is commutative), but computed in ONE
  * projection: the signature never shuffles word rows, so the only
  * exchange left in the near-dup operator is the tiny per-band bucket
  * aggregation.
  */
case class SimHashSig(child: Expression, prefix: String, bits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "simhash_sig"

  private lazy val prefixBytes =
    prefix.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override protected def nullSafeEval(input: Any): Any =
    SimHashSig.sig(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], prefixBytes, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("prefix", prefixBytes, "byte[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHashSig.sig($c, $pRef, $bits);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

object SimHashSig {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static — called from generated code. */
  def sig(text: org.apache.spark.unsafe.types.UTF8String,
          prefix: Array[Byte], bits: Int): Long = {
    val words = text.toString.split(" ", -1)
    val votes = new Array[Long](bits)
    val md = md5.get()
    var i = 0
    while (i < words.length) {
      md.reset()
      md.update(prefix)
      md.update(words(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val d = md.digest()
      var h = 0L
      var j = 0
      while (j < 8) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
      h = h >>> 4
      var k = 0
      while (k < bits) { votes(k) += ((h >> k) & 1L) * 2L - 1L; k += 1 }
      i += 1
    }
    var sh = 0L
    var k = 0
    while (k < bits) { if (votes(k) > 0L) sh |= 1L << k; k += 1 }
    sh
  }

  def apply(c: Column, prefix: String, bits: Int): Column =
    GraftBridge.column(SimHashSig(GraftBridge.expression(c), prefix, bits))
}

/** Codegen'd MinHash signature (C2): the `lanes` Kirsch-Mitzenmacher
  * minhash lanes over a document's word-trigram shingles — per shingle
  * ONE md5 of `"mh:" + shingle`, h1 = hex digits 1-15, h2 = hex digits
  * 17-31 mod 2⁵⁹, lane_j = min over shingles of h1 + j·h2 — exactly the
  * explode → per-lane-min groupBy pipeline (min is order-insensitive),
  * but in ONE projection: shingle rows never exist, so the signature
  * costs no explode and no shuffle. Returns null-free array(lanes);
  * callers filter under-3-word docs (the pipeline's where) — on shorter
  * text the array is all Long.MaxValue, matching "no shingles".
  */
case class MinHashSig(child: Expression, lanes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.sig(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], lanes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSig.sig($c, $lanes);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val Prefix = "mh:".getBytes(java.nio.charset.StandardCharsets.UTF_8)
  private val Space = " ".getBytes(java.nio.charset.StandardCharsets.UTF_8)
  private val H2Mod = 576460752303423488L // 2^59

  /** Static — called from generated code. */
  def sig(text: org.apache.spark.unsafe.types.UTF8String, lanes: Int): ArrayData = {
    val words = text.toString.split(" ", -1)
    val out = Array.fill(lanes)(Long.MaxValue)
    val m = words.length - 2
    if (m > 0) {
      val wb = new Array[Array[Byte]](words.length)
      var i = 0
      while (i < words.length) {
        wb(i) = words(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        i += 1
      }
      val md = md5.get()
      i = 0
      while (i < m) {
        md.reset()
        md.update(Prefix)
        md.update(wb(i)); md.update(Space)
        md.update(wb(i + 1)); md.update(Space)
        md.update(wb(i + 2))
        val d = md.digest()
        var a = 0L; var b = 0L
        var j = 0
        while (j < 8) { a = (a << 8) | (d(j) & 0xffL); j += 1 }
        while (j < 16) { b = (b << 8) | (d(j) & 0xffL); j += 1 }
        val h1 = a >>> 4          // hex digits 1-15
        val h2 = (b >>> 4) % H2Mod // hex digits 17-31, mod 2^59
        j = 0
        while (j < lanes) {
          val v = h1 + j.toLong * h2
          if (v < out(j)) out(j) = v
          j += 1
        }
        i += 1
      }
    }
    ArrayData.toArrayData(out)
  }

  def apply(c: Column, lanes: Int): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(c), lanes))
}

/** Codegen'd per-document repetition statistics (C21): `[top-word count,
  * word count, top-bigram count, bigram count, distinct-bigram count]`
  * in one pass over the text — value-identical to the two explode →
  * (doc, token) count → per-doc roll-up rounds (max / sum / distinct are
  * order-insensitive), but token rows never exist and nothing shuffles:
  * the whole Gopher repetition profile is a projection.
  */
case class RepetitionStats(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, false)
  override def prettyName: String = "repetition_stats"

  override protected def nullSafeEval(input: Any): Any =
    RepetitionStats.stats(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RepetitionStats.stats($c);")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {
  /** Static — called from generated code. */
  def stats(text: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val words = text.toString.split(" ", -1)
    val wc = new java.util.HashMap[String, Long]()
    var i = 0
    while (i < words.length) {
      wc.merge(words(i), 1L, java.lang.Long.sum _)
      i += 1
    }
    var topW = 0L
    val wIt = wc.values().iterator()
    while (wIt.hasNext) { val v = wIt.next(); if (v > topW) topW = v }
    val bc = new java.util.HashMap[String, Long]()
    i = 0
    while (i + 1 < words.length) {
      bc.merge(words(i) + " " + words(i + 1), 1L, java.lang.Long.sum _)
      i += 1
    }
    var topB = 0L
    val bIt = bc.values().iterator()
    while (bIt.hasNext) { val v = bIt.next(); if (v > topB) topB = v }
    val nB = math.max(words.length - 1, 0).toLong
    ArrayData.toArrayData(
      Array(topW, words.length.toLong, topB, nB, bc.size().toLong))
  }

  def apply(c: Column): Column =
    GraftBridge.column(RepetitionStats(GraftBridge.expression(c)))
}

/** Codegen'd IN-BUCKET cosine verify (C20): given one LSH bucket's
  * occupants as `array<struct<vec_id, nv>>` (the rows the bucket shuffle
  * co-located), emit every i<j pair whose dot product clears `minCos` —
  * `array<struct<v1, v2, cos_sim>>`, exploded by the caller. This is the
  * distributed-LSH verify shape: vectors ship to their buckets ONCE and
  * every candidate pair is generated AND verified inside one projection,
  * so the plan has no candidate-stream join at all (the former
  * pair-expand → nv-lookup-join form materialized the multi-million-row
  * duplicated candidate stream as a join input, which the optimizer's
  * post-aggregate size estimates then mis-planned as the broadcast side).
  * Output is only the qualifying pairs — collisions across tables are
  * deduped downstream on the tiny survivor set.
  */
case class CosinePairs(child: Expression, minCos: Double)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = CosinePairs.outType
  override def prettyName: String = "cosine_pairs"

  override protected def nullSafeEval(input: Any): Any =
    CosinePairs.pairs(input.asInstanceOf[ArrayData], minCos)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CosinePairs.pairs($c, $minCos);")

  override protected def withNewChildInternal(newChild: Expression): CosinePairs =
    copy(child = newChild)
}

object CosinePairs {
  import org.apache.spark.sql.types._

  val outType: DataType = ArrayType(StructType(Seq(
    StructField("v1", LongType, nullable = false),
    StructField("v2", LongType, nullable = false),
    StructField("cos_sim", DoubleType, nullable = false))), containsNull = false)

  /** Static — called from generated code. Pairs are emitted in (i, j)
    * array order; the caller array_sorts the bucket by vec_id first, so
    * v1 < v2 holds structurally.
    */
  def pairs(vs: ArrayData, minCos: Double): ArrayData = {
    val n = vs.numElements()
    val ids = new Array[Long](n)
    val vecs = new Array[Array[Double]](n)
    var i = 0
    while (i < n) {
      val r = vs.getStruct(i, 2)
      ids(i) = r.getLong(0)
      vecs(i) = r.getArray(1).toDoubleArray()
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val c = DotProduct.dot(vecs(i), vecs(j))
        if (c >= minCos) {
          out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](ids(i), ids(j), c))
        }
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  def apply(c: Column, minCos: Double): Column =
    GraftBridge.column(CosinePairs(GraftBridge.expression(c), minCos))
}

/** Codegen'd multi-table LSH bucket keys (C20): all `nTables` sign-bucket
  * keys of a normalized vector in ONE expression — key_t = Σ_j
  * (nv · plane_{t,j} ≥ 0) << j over the flattened plane matrix riding as
  * a generated-class reference object. The inline-per-table form (b × k
  * DotProduct expressions in a single projection) grows the generated
  * method past janino's limits once the scale policy picks dozens of
  * tables (83 tables × 11 planes at n=10⁶ broke whole-stage codegen
  * outright); here the generated code is one static call regardless of
  * the table count, and the plane matrix lives once per task, not once
  * per expression tree.
  */
case class LshTableKeys(child: Expression, planes: Array[Double],
                        nTables: Int, nPlanes: Int, dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "lsh_table_keys"

  override protected def nullSafeEval(input: Any): Any =
    LshTableKeys.keys(input.asInstanceOf[ArrayData], planes, nTables, nPlanes, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("planes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.LshTableKeys.keys($c, $pRef, $nTables, $nPlanes, $dim);")
  }

  override protected def withNewChildInternal(newChild: Expression): LshTableKeys =
    copy(child = newChild)
}

object LshTableKeys {
  /** Static — called from generated code. */
  def keys(nv: ArrayData, planes: Array[Double],
           nTables: Int, nPlanes: Int, dim: Int): ArrayData = {
    val v = nv.toDoubleArray()
    val out = new Array[Int](nTables)
    var t = 0
    while (t < nTables) {
      var key = 0
      var j = 0
      while (j < nPlanes) {
        val off = (t * nPlanes + j) * dim
        var s = 0.0
        var i = 0
        while (i < dim) { s += v(i) * planes(off + i); i += 1 }
        if (s >= 0.0) key |= 1 << j
        j += 1
      }
      out(t) = key
      t += 1
    }
    ArrayData.toArrayData(out)
  }

  def apply(c: Column, planes: Array[Double],
            nTables: Int, nPlanes: Int, dim: Int): Column =
    GraftBridge.column(
      LshTableKeys(GraftBridge.expression(c), planes, nTables, nPlanes, dim))
}

/** Codegen'd CROSS-bucket cosine verify — [[CosinePairs]]' companion for
  * C20's skew valve: all left×right pairs of two DISJOINT member slices
  * (contiguous slices of one vec_id-sorted bucket, left strictly before
  * right, so v1 < v2 holds structurally) that clear `minCos`. A bucket
  * bigger than the per-task cap becomes a triangular grid of
  * (same-slice CosinePairs) + (cross-slice CosineCrossPairs) cells, each
  * cell a bounded unit of work on its own row — in-bucket verify skew is
  * then row-level parallelism the scheduler can spread, instead of one
  * giant C(m,2) loop pinned inside a single task.
  */
case class CosineCrossPairs(left: Expression, right: Expression, minCos: Double)
    extends BinaryExpression {

  override def dataType: DataType = CosinePairs.outType
  override def prettyName: String = "cosine_cross_pairs"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineCrossPairs.pairs(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], minCos)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.CosineCrossPairs.pairs($a, $b, $minCos);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineCrossPairs =
    copy(left = newLeft, right = newRight)
}

object CosineCrossPairs {
  /** Static — called from generated code. */
  def pairs(ls: ArrayData, rs: ArrayData, minCos: Double): ArrayData = {
    val nl = ls.numElements()
    val nr = rs.numElements()
    val lid = new Array[Long](nl)
    val lv = new Array[Array[Double]](nl)
    var i = 0
    while (i < nl) {
      val r = ls.getStruct(i, 2)
      lid(i) = r.getLong(0); lv(i) = r.getArray(1).toDoubleArray(); i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var j = 0
    while (j < nr) {
      val r = rs.getStruct(j, 2)
      val rid = r.getLong(0)
      val rv = r.getArray(1).toDoubleArray()
      i = 0
      while (i < nl) {
        val c = DotProduct.dot(lv(i), rv)
        if (c >= minCos) {
          out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](lid(i), rid, c))
        }
        i += 1
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  def apply(a: Column, b: Column, minCos: Double): Column =
    GraftBridge.column(CosineCrossPairs(
      GraftBridge.expression(a), GraftBridge.expression(b), minCos))
}

/** CQL2 ACCENTI accessor kernel: Unicode-exact accent stripping — NFD
  * decomposition, then drop combining marks — which is precisely what
  * DuckDB's `strip_accents` (utf8proc) computes, so the oracle SQL can
  * render `strip_accents(x)` and hash-match bit for bit. Characters with
  * no canonical decomposition (ß, Ø, Ł, Œ, Æ) pass through unchanged in
  * BOTH engines — that agreement is load-bearing and spec-pinned.
  * Codegen'd: one static call per row, no UDF in the hot path.
  */
case class StripAccents(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "strip_accents"

  override protected def nullSafeEval(input: Any): Any =
    StripAccents.strip(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.StripAccents.strip($c);")

  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}

object StripAccents {
  private val marks = java.util.regex.Pattern.compile("\\p{Mn}+")

  /** Static — called from generated code. ASCII fast path: the fixture
    * corpora are ASCII, so the normalizer usually never runs.
    */
  def strip(s: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String = {
    val str = s.toString
    var ascii = true
    var i = 0
    while (ascii && i < str.length) { if (str.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) s
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      marks.matcher(java.text.Normalizer.normalize(str,
        java.text.Normalizer.Form.NFD)).replaceAll(""))
  }

  def apply(c: Column): Column =
    GraftBridge.column(StripAccents(GraftBridge.expression(c)))
}
