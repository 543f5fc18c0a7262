package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native codegen popcount ops over multi-word bitmasks (array<bigint>) —
  * the wide-vocabulary (V > 64) hot path of `Dedup.tokenMasks`.
  *
  * The higher-order-function formulation
  * (`aggregate(zip_with(a, b, (x,y) -> bit_count(x & y)), 0, (acc,n) ->
  * acc + n)`) is semantically identical but runs interpreted, several
  * Catalyst expression evals per mask WORD — and the pairwise verify
  * evaluates it once per candidate pair. These expressions participate in
  * whole-stage codegen: the generated Java is a tight primitive loop of
  * `Long.bitCount` over the unsafe array data, the same treatment (and
  * measured rationale) as [[VecDot]] for dot products.
  *
  * The single-long path (V ≤ 64) keeps the built-in `bit_count(a & b)` —
  * already codegen'd, nothing to win there.
  */
case class MaskIntersect(left: Expression, right: Expression) extends BinaryExpression {

  private def ok(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _                      => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mask_intersect requires array<bigint> arguments, got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "mask_intersect"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0
    var i = 0
    while (i < n) {
      s += java.lang.Long.bitCount(x.getLong(i) & y.getLong(i))
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $s = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += java.lang.Long.bitCount($a.getLong($i) & $b.getLong($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): MaskIntersect =
    copy(left = newLeft, right = newRight)
}

/** Total popcount of one multi-word mask — the per-side cardinality the
  * Jaccard denominator needs. Same codegen rationale as [[MaskIntersect]]. */
case class MaskCard(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"mask_card requires array<bigint>, got $t")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "mask_card"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0
    var i = 0
    while (i < x.numElements()) {
      s += java.lang.Long.bitCount(x.getLong(i))
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => {
      // single-expression form so defineCodeGen can inline it; the loop
      // lives in a static helper to keep the generated method small
      s"graft.functions.MaskCard.card($a)"
    })

  override protected def withNewChildInternal(newChild: Expression): MaskCard =
    copy(child = newChild)
}

object MaskCard {
  /** Called from generated code. */
  def card(a: ArrayData): Int = {
    var s = 0
    var i = 0
    while (i < a.numElements()) {
      s += java.lang.Long.bitCount(a.getLong(i))
      i += 1
    }
    s
  }
}

object MaskOps {
  /** Expression builders with arity checks, shared by the temp-function
    * and extensions registration paths (same shape as VecDot.builder). */
  def intersectExpr(children: Seq[Expression]): MaskIntersect = {
    require(children.size == 2,
      s"mask_intersect requires exactly 2 arguments, got ${children.size}")
    MaskIntersect(children.head, children(1))
  }
  def cardExpr(children: Seq[Expression]): MaskCard = {
    require(children.size == 1,
      s"mask_card requires exactly 1 argument, got ${children.size}")
    MaskCard(children.head)
  }

  /** Register `mask_intersect` / `mask_card` on the session. Idempotent. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "mask_intersect", intersectExpr _, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "mask_card", cardExpr _, "built-in")
  }
}
