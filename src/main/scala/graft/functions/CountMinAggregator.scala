package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator
import net.jpountz.xxhash.XXHashFactory

/** Typed Count-Min sketch aggregator — the frequency-estimation companion
  * to [[MinHashAggregator]] (set similarity) and the built-in HLL
  * (cardinality): point-queryable approximate counts over a token stream
  * in ONE fixed-size accumulator, the heavy-hitter primitive a 100 TB
  * corpus scan uses where an exact groupBy's key cardinality (billions of
  * distinct tokens) would swamp the shuffle.
  *
  * Buffer is a flat depth×width Long matrix (4×1024 → 32 KB, constant
  * regardless of stream size); `reduce` increments one counter per row
  * (xxhash64 of the token bytes, salted by the row index, mod width);
  * `merge` is elementwise add — associative and commutative, so Spark runs
  * it partial+final like any built-in aggregate and the shuffle carries
  * 32 KB per partition, never tokens. Point estimate = min over rows of
  * the addressed counters; CMS never under-estimates, and over-estimates
  * by ≤ εN with ε = e/width at high probability (Cormode & Muthukrishnan,
  * "An improved data stream summary: the count-min sketch and its
  * applications", J. Algorithms 55(1), 2005).
  *
  * Like the MinHash UDAF, input is the token's UTF-8 BYTES
  * (`cast('binary')`): the untyped-UDAF bridge pays a straight byte copy
  * instead of a per-row char decode.
  */
class CountMinAggregator(depth: Int = 4, width: Int = 1024)
    extends Aggregator[Array[Byte], Array[Long], Seq[Long]] {

  @transient private lazy val xx = XXHashFactory.fastestInstance().hash64()

  override def zero: Array[Long] = Array.fill(depth * width)(0L)

  override def reduce(buf: Array[Long], bytes: Array[Byte]): Array[Long] = {
    var d = 0
    while (d < depth) {
      val h = xx.hash(bytes, 0, bytes.length, d.toLong)
      val slot = ((h % width) + width) % width
      buf(d * width + slot.toInt) += 1
      d += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object CountMinAggregator {
  /** Driver-side point query against a finished sketch (the sketch is one
    * aggregate SCALAR — 32 KB — so querying it locally is the intended
    * use; the heavy distributed work is building it).
    */
  def estimate(sketch: Seq[Long], depth: Int, width: Int, token: String): Long = {
    val xx = XXHashFactory.fastestInstance().hash64()
    val bytes = token.getBytes("UTF-8")
    var best = Long.MaxValue
    var d = 0
    while (d < depth) {
      val h = xx.hash(bytes, 0, bytes.length, d.toLong)
      val slot = (((h % width) + width) % width).toInt
      val v = sketch(d * width + slot)
      if (v < best) best = v
      d += 1
    }
    best
  }
}
