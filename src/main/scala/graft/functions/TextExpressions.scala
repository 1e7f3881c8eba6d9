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

/** Static kernel called from both interpreted eval and generated code (Scala
  * emits static forwarders for top-level objects, so janino links
  * `ShingleKernel.compute` directly).
  */
object ShingleKernel {
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
}
