package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items summary: at most `k` counters + the exact
  * stream length. */
case class MGSummary(n: Long, items: Map[String, Long])

/** Bounded-memory heavy-hitter sketch (Misra & Gries 1982) as a typed
  * `Aggregator` — the deterministic-guarantee sibling of the HLL (q41)
  * and histogram (q73) sketches. The buffer holds ≤ `k` counters
  * regardless of input cardinality, so a 100 TB stream with billions of
  * distinct items shuffles k×#partitions rows instead of #distinct —
  * the whole point versus an exact groupBy.
  *
  * Guarantee (preserved under arbitrary merge order — Agarwal et al.,
  * "Mergeable Summaries", PODS 2012): for every item x,
  * `true(x) − n/(k+1) ≤ est(x) ≤ true(x)`, and any item with
  * `true(x) > n/(k+1)` is present in the summary — no false negatives
  * above that bar. Counter VALUES depend on partitioning (only the
  * bound is deterministic), which is why the public two-pass API
  * (`TextStats.heavyHitters`) re-counts candidates exactly before
  * thresholding: the composition is bit-deterministic and oracle-able.
  */
class MisraGriesAgg(k: Int) extends Aggregator[String, MGSummary, MGSummary] {
  require(k >= 1, "k must be positive")

  override def zero: MGSummary = MGSummary(0L, Map.empty)

  /** Drop every counter by `d`, discarding the non-positive (the classic
    * decrement step, batched). */
  private def decrement(m: Map[String, Long], d: Long): Map[String, Long] =
    if (d <= 0) m
    else m.flatMap { case (s, c) => if (c > d) Some(s -> (c - d)) else None }

  override def reduce(buf: MGSummary, item: String): MGSummary = {
    val bumped = buf.items.updatedWith(item) {
      case Some(c) => Some(c + 1)
      case None    => Some(1L)
    }
    val kept =
      if (bumped.size <= k) bumped
      else decrement(bumped, bumped.values.min) // size is k+1: min leaves ≤ k
    MGSummary(buf.n + 1, kept)
  }

  override def merge(a: MGSummary, b: MGSummary): MGSummary = {
    val sum = b.items.foldLeft(a.items) { case (m, (s, c)) =>
      m.updatedWith(s) { case Some(x) => Some(x + c); case None => Some(c) }
    }
    val kept =
      if (sum.size <= k) sum
      else { // subtract the (k+1)-th largest count, keeping ≤ k positives
        val d = sum.values.toArray.sortBy(-_).apply(k)
        decrement(sum, d)
      }
    MGSummary(a.n + b.n, kept)
  }

  override def finish(buf: MGSummary): MGSummary = buf

  override def bufferEncoder: Encoder[MGSummary] = ExpressionEncoder[MGSummary]()
  override def outputEncoder: Encoder[MGSummary] = ExpressionEncoder[MGSummary]()
}
