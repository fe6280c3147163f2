package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: segment one word with a BPE merge table
  * (merges replayed in rank order, each a greedy left-to-right pass — the
  * exact contract of `TextStats.bpeFit`'s training rewrite, so encoding a
  * word reproduces the symbols the trainer left it with).
  *
  * Why an expression (tier b): the replay is inherently iterative per
  * word — numMerges dependent rewrites — which as DataFrame algebra costs
  * one plan layer (and, eagerly checkpointed, one Spark JOB) per merge.
  * Here the whole replay is ONE map-only evaluation per row: a 32K-merge
  * production table costs numMerges×len scalar work inside the task,
  * distributed across the cluster, instead of 32K sequential driver-paced
  * rounds. Runs on the distinct-word vocabulary (bounded), not the
  * corpus, so CodegenFallback's per-row overhead is irrelevant.
  *
  * The merge table travels as a literal constructor argument (a deploy
  * artifact, ≤ numMerges pairs — broadcast-sized by construction, like
  * the PQ codebook literals in `pqEncode`). */
case class BpeSegment(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val mergeArr: Array[(String, String)] = merges.toArray

  override def nullSafeEval(w: Any): Any = {
    val segs = BpeSegment.segment(w.asInstanceOf[UTF8String].toString, mergeArr)
    new GenericArrayData(segs.map(s => UTF8String.fromString(s): Any))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeSegment {
  /** Column-level API. */
  def apply(word: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(new BpeSegment(Bridge.expression(word), merges))

  /** The scalar kernel: code-point split, then each merge in rank order
    * as a greedy left-to-right fold (overlapping runs merge exactly once
    * — "aaa" under (a,a) → [aa, a]). Identical to the vocab rewrite the
    * trainer applies, for ANY merge table (not just fit-produced ones —
    * no lowest-rank-first shortcut, which diverges on tables whose later
    * ranks feed earlier ones). */
  def segment(w: String, merges: Array[(String, String)]): Array[String] = {
    var syms = codePoints(w)
    var i = 0
    while (i < merges.length) {
      val (l, r) = merges(i)
      // skip scan: only rewrite when the pair actually occurs
      var j = 0
      var hit = false
      while (!hit && j < syms.length - 1) {
        hit = syms(j) == l && syms(j + 1) == r; j += 1
      }
      if (hit) {
        val out = new Array[String](syms.length)
        var n = 0
        var k = 0
        while (k < syms.length) {
          val x = syms(k)
          if (n > 0 && out(n - 1) == l && x == r) out(n - 1) = l + r
          else { out(n) = x; n += 1 }
          k += 1
        }
        syms = java.util.Arrays.copyOf(out, n)
      }
      i += 1
    }
    syms
  }

  private def codePoints(w: String): Array[String] = {
    val buf = new scala.collection.mutable.ArrayBuffer[String](w.length)
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      buf += w.substring(i, i + n); i += n
    }
    buf.toArray
  }
}
