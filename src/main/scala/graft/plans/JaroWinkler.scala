package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Jaro-Winkler similarity of two strings —
  * the record-linkage scorer for short identifying fields (names, codes),
  * complementing the token-level (minhash) and character-edit (Levenshtein)
  * near-dup kernels.
  *
  * Variant: the standard Winkler refinement — prefix bonus p=0.1 over at
  * most 4 common leading characters, applied ONLY when the base Jaro
  * similarity exceeds the 0.7 boost threshold. This is the same variant
  * DuckDB's `jaro_winkler_similarity` ships, so results are oracle-exact:
  * validated bit-identical on 5000 random strings plus the textbook
  * fixtures (JaroWinklerSpec). All arithmetic is a fixed small expression
  * tree over integer match counts, so any engine implementing the same
  * variant produces the same IEEE doubles.
  *
  * Tier (b) of the custom-operator preference order (compose < Expression <
  * LogicalPlan): Spark has no jaro function, the composable alternative
  * (per-row UDF) would break whole-stage codegen; this expression stays
  * inside it as a single static call per row.
  *
  * Semantics are over UTF-16 code units (fine for names; astral-plane
  * pairs count as two units — document, don't branch).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.sim(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // the companion's static forwarder keeps the generated code a plain
    // Java static call — no boxing, no virtual dispatch
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.JaroWinkler.sim($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object JaroWinkler {
  /** Column-level API. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(new JaroWinkler(Bridge.expression(a), Bridge.expression(b)))

  /** Codegen target. */
  def sim(ua: UTF8String, ub: UTF8String): Double =
    simStr(ua.toString, ub.toString)

  /** The scalar kernel. Match window = max(len)/2 − 1; transpositions =
    * half the out-of-order matched positions; jaro = (m/l1 + m/l2 +
    * (m−t)/m)/3; + prefix·0.1·(1−jaro) iff jaro > 0.7. The flop ORDER here
    * is part of the contract (left-assoc sums, final /3.0) — reorderings
    * produce different ulps and break oracle hash-exactness. */
  def simStr(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    // equality FIRST: two empty strings are identical — DuckDB's
    // rapidfuzz-derived jaro_winkler_similarity returns 1.0 there, and
    // the bit-exact contract must agree
    if (s1 == s2) return 1.0
    if (l1 == 0 || l2 == 0) return 0.0
    val win = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val c = s1.charAt(i)
      val hi = math.min(l2, i + win + 1)
      var j = math.max(0, i - win)
      while (j < hi) {
        if (!m2(j) && s2.charAt(j) == c) {
          m1(i) = true; m2(j) = true; m += 1
          j = hi // first unclaimed match wins; exit window scan
        } else j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val jaro = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
    if (jaro > 0.7) {
      val pmax = math.min(4, math.min(l1, l2))
      var l = 0
      while (l < pmax && s1.charAt(l) == s2.charAt(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    } else jaro
  }
}
