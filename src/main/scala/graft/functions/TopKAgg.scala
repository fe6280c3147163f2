package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate flowing into [[TopKByScore]]. */
case class Scored(id: Long, score: Double)

/** Bounded top-k aggregator: keeps the k best (score desc, id asc) rows per
  * group in a fixed-size buffer — the combiner-friendly replacement for
  * `row_number().over(Window.partitionBy(key))` top-k.
  *
  * Why this exists (the 100 TB shape): a per-query top-k over a scored
  * candidate relation has very few distinct keys (the query set), so a
  * window funnels the ENTIRE relation into ≤ #queries tasks — one task
  * sorts ~10⁹ rows at scale. As a typed Aggregator the plan becomes
  * ObjectHashAggregate with map-side partials: every input partition
  * reduces locally into a ≤2k-element buffer, and only those buffers
  * shuffle (k × #partitions rows per query, not the relation). Same answer,
  * identical tie-break (score desc, id asc — a total order), bounded memory.
  *
  * Reference analogue: the embedded engine's Limit planning never sorts a
  * full partition for top-n (indexr-query-opt/.../IndexRStrategies.java:
  * 126-132); this is that contract for grouped top-k.
  */
class TopKByScore(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  require(k > 0, "k must be positive")

  private def better(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  private def compact(buf: Seq[Scored]): Seq[Scored] =
    buf.sortWith(better).take(k)

  override def zero: Seq[Scored] = Vector.empty

  // amortized O(1) per row: append, compact only when the buffer doubles
  override def reduce(buf: Seq[Scored], r: Scored): Seq[Scored] = {
    val b = buf :+ r
    if (b.size >= 2 * k) compact(b) else b
  }

  override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
    compact(a ++ b)

  override def finish(buf: Seq[Scored]): Seq[Scored] = compact(buf)

  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
}
