package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded bottom-k aggregator over exact longs: keeps the k smallest
  * values per group in a fixed-size buffer — the KMV (k-minimum-values)
  * distinct sketch primitive (Bar-Yossef et al., RANDOM 2002).
  *
  * Why not [[TopKByScore]] with a negated score: KMV elements are 60-bit
  * md5 hashes and a double mantissa holds 53 bits — the cast would collide
  * distinct hashes and break the exact, engine-portable sketch contract.
  * This buffer orders the raw longs, so the sketch a 1000-executor cluster
  * produces is bit-identical to the oracle's ORDER BY h LIMIT k.
  *
  * Scale: plans as ObjectHashAggregate with map-side partials — each input
  * partition reduces locally to a ≤2k buffer and only buffers shuffle
  * (k × #partitions rows per group, never the element relation).
  */
class BottomKLongs(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k > 0, "k must be positive")

  private def compact(buf: Seq[Long]): Seq[Long] = buf.distinct.sorted.take(k)

  override def zero: Seq[Long] = Vector.empty

  // amortized O(1) per row: append, compact only when the buffer doubles
  override def reduce(buf: Seq[Long], v: Long): Seq[Long] = {
    val b = buf :+ v
    if (b.size >= 2 * k) compact(b) else b
  }

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = compact(a ++ b)

  override def finish(buf: Seq[Long]): Seq[Long] = compact(buf)

  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}
