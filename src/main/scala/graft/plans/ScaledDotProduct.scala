package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expression: the scaled-integer dot product
  * Σ floor(a[i]·b[i]·1e15) of two float vectors, as a single codegen'd loop.
  *
  * This is the hot inner kernel of every similarity operator (brute-force
  * ANN, IVF, LSH verification). The composable form —
  * `aggregate(zip_with(a, b, …))` — materializes an intermediate array and
  * evaluates two lambda closures per element; this expression is one branch-
  * free loop over the two ArrayData buffers, stays inside whole-stage
  * codegen, and produces bit-identical results (same floor/scale semantics,
  * see graft.operators.Similarity).
  *
  * Tier (b) of the custom-operator preference order (compose < Expression <
  * LogicalPlan): a scalar kernel Spark lacks, so an Expression is the right
  * altitude — no planner surgery needed.
  */
case class ScaledDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must be array<float> (ExpectsInputTypes is private[sql]; inputs
  // are produced by our own operators, so resolution-time checking suffices)
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += math.floor(x.getFloat(i).toDouble * y.getFloat(i).toDouble * 1e15).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (long) java.lang.Math.floor(
         |    (double) $a.getFloat($i) * (double) $b.getFloat($i) * 1e15);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object ScaledDotProduct {
  /** Column-level API. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(new ScaledDotProduct(Bridge.expression(a), Bridge.expression(b)))
}
