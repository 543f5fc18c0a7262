package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen trailing-window series kernels (r12 optimization round,
  * guide §4). The window keys collect a trailing ≤16-sample array per row
  * and then run O(k²) interpreted higher-order expressions over it —
  * `win_theil_sen`'s pairwise-slope median evaluated ~120 slopes through
  * `transform`/`flatten`/`array_sort`/`aggregate` PER ROW, each element a
  * boxed Catalyst eval. These kernels compute the identical values in a
  * tight primitive loop inside whole-stage codegen.
  *
  * Exactness: slope arithmetic replays the HOF's IEEE op order verbatim;
  * the sort is a stable TimSort under the SAME comparator Spark's
  * `array_sort` uses for doubles (`SQLOrderingUtil.compareDoubles` — ±0.0
  * compare equal, NaN greatest), so the sorted multiset AND the order of
  * equal-comparing elements (stability) match; SeriesOpsSpec pins equality
  * against the HOF formulation on adversarial inputs (±0.0, NaN, constant
  * runs) plus randomized series. */
object SeriesOps {

  /** Theil–Sen readout of `win_theil_sen`: all pairwise slopes
    * (l[j]−l[i])/(j−i) for 1 ≤ i < j ≤ k, sorted ascending, median
    * (lower-middle/upper-middle mean when even), floored at 1e-4.
    * Returns null when k < 2 (boxed Double for the nullable slot).
    * Called from generated code. */
  def theilSen(l: ArrayData): java.lang.Double = {
    val k = l.numElements()
    if (k < 2) return null
    val v = new Array[Double](k)
    var i = 0
    while (i < k) { v(i) = l.getDouble(i); i += 1 }
    val m = k * (k - 1) / 2
    val slopes = new Array[java.lang.Double](m)
    var p = 0
    i = 0
    while (i < k - 1) {
      var j = i + 1
      while (j < k) {
        // identical IEEE ops to the HOF: (element_at(l,j) - element_at(l,i)) / (j - i)
        slopes(p) = java.lang.Double.valueOf((v(j) - v(i)) / (j - i).toDouble)
        p += 1
        j += 1
      }
      i += 1
    }
    // stable sort under Spark's array_sort double comparator
    java.util.Arrays.sort(slopes, SeriesOps.sparkDoubleComparator)
    val med =
      if (m % 2 == 1) slopes((m + 1) / 2 - 1).doubleValue()
      else (slopes(m / 2 - 1).doubleValue() + slopes(m / 2).doubleValue()) / 2.0
    // SQL floor(double) is LongType: math.floor(x).toLong (NaN → 0,
    // ±Inf → Long.Min/MaxValue), then `/ 10000` divides as doubles —
    // replay exactly so non-finite medians round-trip like the HOF's.
    java.lang.Double.valueOf(math.floor(med * 10000).toLong.toDouble / 10000.0)
  }

  /** The comparator Spark's ordering applies to DoubleType. */
  val sparkDoubleComparator: java.util.Comparator[java.lang.Double] =
    new java.util.Comparator[java.lang.Double] {
      override def compare(a: java.lang.Double, b: java.lang.Double): Int =
        org.apache.spark.sql.catalyst.util.SQLOrderingUtil.compareDoubles(
          a.doubleValue(), b.doubleValue())
    }

  def theilSenExpr(children: Seq[Expression]): TheilSenMedian = {
    require(children.size == 1,
      s"theil_sen_med requires exactly 1 argument, got ${children.size}")
    TheilSenMedian(children.head)
  }

  /** Register the series kernels on the session. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "theil_sen_med", theilSenExpr _, "built-in")
}

/** `theil_sen_med(array<double>)` — see [[SeriesOps.theilSen]]. */
case class TheilSenMedian(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"theil_sen_med requires array<double>, got $t")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "theil_sen_med"
  override def nullSafeEval(a: Any): Any = {
    val r = SeriesOps.theilSen(a.asInstanceOf[ArrayData])
    if (r == null) null else r.doubleValue()
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val boxed = ctx.freshName("ts")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |java.lang.Double $boxed = graft.functions.SeriesOps.theilSen($c);
         |if ($boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = $boxed.doubleValue(); }
       """.stripMargin)
  }
  override protected def withNewChildInternal(newChild: Expression): TheilSenMedian =
    copy(child = newChild)
}
