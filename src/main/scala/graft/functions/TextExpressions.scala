package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** shingles(text, n): the DISTINCT space-joined word n-grams of `text` as an
  * array, in first-occurrence order. Splitting matches Spark's
  * `split(text, " ")` exactly (Java regex, limit -1: trailing empty strings
  * kept), so `explode(shingles(text, 3))` produces the same (doc_id, s) set
  * as the posexplode → windowed lead(k) → dropDuplicates pipeline it
  * replaces — with ZERO shuffles instead of two (the per-doc window sort and
  * the distinct) before any signature work starts. One codegen-stage pass
  * over the corpus; the per-row hash set is bounded by document length.
  *
  * Sits under the whole near-dup family (minhash expression + UDAF paths,
  * components, repetition, contamination, n-gram Jaccard) — at 100 TB this
  * is the difference between "scan the corpus once" and "shuffle the
  * exploded corpus twice".
  */
case class DistinctShingles(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = left.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, int literal) arguments, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }

  override def nullSafeEval(t: Any, n: Any): Any =
    ShingleKernel.compute(t.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) =>
      s"${ev.value} = graft.functions.ShingleKernel.compute($t, $n);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : DistinctShingles = copy(left = l, right = r)
  override def prettyName: String = "shingles"
}

/** pos_shingles(text, n): ALL space-joined word n-grams of `text` in
  * POSITIONAL order — element i is the n-gram starting at word i, so
  * `posexplode(pos_shingles(text, 3))` yields (pos, span) rows whose pos
  * indexes directly into `split(text, " ")`. The positional sibling of
  * [[DistinctShingles]] (same split semantics, duplicates KEPT): span-
  * granular operators (ExactSubstr-style duplicate-span removal) need to
  * know WHERE a span sits, not just that the doc contains it. One codegen
  * pass, zero shuffles — replaces the posexplode → per-doc windowed
  * lead(k) formulation that sorts the exploded corpus inside per-doc
  * windows.
  */
case class PositionalShingles(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = left.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, int literal) arguments, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }

  override def nullSafeEval(t: Any, n: Any): Any =
    ShingleKernel.positional(t.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) =>
      s"${ev.value} = graft.functions.ShingleKernel.positional($t, $n);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : PositionalShingles = copy(left = l, right = r)
  override def prettyName: String = "pos_shingles"
}

/** simhash64(text): the 64-bit SimHash of a document's words in ONE codegen
  * pass — bit b is the sign of Σ_words (±1 by bit b of xxhash64(word)),
  * counting every occurrence. Bit-identical to the
  * explode → xxhash64 → 64×sum(when) → pack formulation it replaces (same
  * split semantics as `split(text, " ")`, same XXH64 seed-42 word hash via
  * the engine's own kernel), but with zero shuffle and a 64-int stack
  * accumulator instead of a 64-column aggregation state.
  */
case class SimHash64(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }

  override def nullSafeEval(t: Any): Any =
    ShingleKernel.simhash(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.ShingleKernel.simhash($t);")

  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
  override def prettyName: String = "simhash64"
}

/** minhash_sig(text): the full 32-permutation MinHash signature of a
  * document's word 3-gram shingles in ONE codegen pass — bit-identical to
  * `explode(shingles(text,3))` → 32× `min(xxhash64(lit(s), sh))` (same
  * split semantics, same Catalyst XXH64 fold: the int permutation id
  * hashes first with seed 42, its result seeds the shingle-bytes hash),
  * but with ZERO aggregation: the signature is a per-row map, so nothing
  * shuffles until LSH banding. Duplicate shingles need no dedup set —
  * min() is idempotent over repeats — so the per-row state is exactly
  * 32 longs. Docs too short for a shingle return an empty array (the
  * exploded formulation simply emits no rows for them); callers filter
  * `size(sig) > 0`.
  */
case class MinHashSig(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = left.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, int literal) arguments, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }

  override def nullSafeEval(t: Any, nh: Any): Any =
    ShingleKernel.minhashSig(t.asInstanceOf[UTF8String], nh.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, nh) =>
      s"${ev.value} = graft.functions.ShingleKernel.minhashSig($t, $nh);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : MinHashSig = copy(left = l, right = r)
  override def prettyName: String = "minhash_sig"
}

/** Static kernel called from both interpreted eval and generated code (Scala
  * emits static forwarders for top-level objects, so janino links
  * `ShingleKernel.compute` directly).
  */
object ShingleKernel {

  /** Per-permutation salts: XXH64.hashInt(s, 42) — exactly what Catalyst's
    * XxHash64 computes for the leading int child of xxhash64(lit(s), sh).
    * Cached per numHashes (in practice one width per JVM).
    */
  private[this] val seedCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
  private def seeds(numHashes: Int): Array[Long] =
    seedCache.computeIfAbsent(numHashes, nh =>
      Array.tabulate(nh)(s =>
        org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(s, 42L)))

  def minhashSig(text: UTF8String, numHashes: Int): ArrayData = {
    val salt = seeds(numHashes)
    val words = text.toString.split(" ", -1)
    val n = 3
    if (words.length < n)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.emptyLongArray)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= words.length - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(words(i + k))
        k += 1
      }
      val u = UTF8String.fromString(sb.toString)
      var s = 0
      while (s < numHashes) {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          u.getBaseObject, u.getBaseOffset, u.numBytes, salt(s))
        if (h < mins(s)) mins(s) = h
        s += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(mins)
  }
  /** All n-grams in positional order (duplicates kept; element i = n-gram
    * at word i). Same split semantics as [[compute]].
    */
  def positional(text: UTF8String, n: Int): ArrayData = {
    val words = text.toString.split(" ", -1)
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](words.length - n + 1)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= words.length - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(words(i + k))
        k += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  def compute(text: UTF8String, n: Int): ArrayData = {
    // identical to Spark's split(text, " "): Java regex, limit -1
    val words = text.toString.split(" ", -1)
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= words.length - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(words(i + k))
        k += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash; word hash = Spark's own xxhash64 (XXH64, seed 42) so
    * the result is bit-identical to `xxhash64(word)` over exploded rows.
    */
  def simhash(text: UTF8String): Long = {
    val words = text.toString.split(" ", -1)
    val sums = new Array[Int](64)
    var i = 0
    while (i < words.length) {
      val w = UTF8String.fromString(words(i))
      val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        w.getBaseObject, w.getBaseOffset, w.numBytes, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) sums(b) += 1 else sums(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (sums(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }
}
