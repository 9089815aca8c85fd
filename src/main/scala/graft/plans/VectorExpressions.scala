package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native sequential-fold dot product over array<float>/array<double>
  * (the ANN hot path).
  *
  * Spark's higher-order functions (`aggregate`, `zip_with`) evaluate
  * interpreted — one closure dispatch per element — which makes a
  * brute-force cosine scan ~60µs/pair. This expression does the same
  * left-to-right double fold in a tight loop via a static call that
  * whole-stage codegen inlines; identical results bit-for-bit (same
  * float→double widening, same accumulation order — the DuckDB oracles
  * still match).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dot_product needs two float/double arrays, got $other")
    }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any =
    DotProduct.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.plans.DotProduct.compute($l, $r, ${isFloat(left)}, ${isFloat(right)});")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}

object DotProduct {

  /** Sequential left-to-right fold in double — matches
    * `aggregate(zip_with(a, b, (x, y) => x*y), 0.0, _+_)` exactly.
    */
  def compute(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** Native PQ asymmetric-distance (ADC) accumulation: `left` is a
  * vector's m codes (array<int>, one per subspace), `right` a query's
  * flattened distance table (array<double>, row-major `sub·ksub + code`
  * with ksub inferred from the lengths). Result: the sum of the m
  * looked-up entries, accumulated in subspace order — deterministic,
  * and the per-candidate cost is m array reads + m adds inside
  * whole-stage codegen, vs. the join + hash-aggregate per (query,
  * candidate, sub) row the relational formulation pays (Jégou et al.,
  * PAMI 2011 — the billion-scale ANN inner loop).
  */
case class AdcDistance(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"adc_distance needs (array<int> codes, array<double> table), got $other")
    }

  override def nullSafeEval(l: Any, r: Any): Any =
    AdcDistance.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.plans.AdcDistance.compute($l, $r);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): AdcDistance =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "adc_distance"
}

object AdcDistance {

  /** Tight lookup-sum loop; throws on a ragged table or out-of-range
    * code — both mean a non-dense codebook, which is a build bug worth
    * failing loudly on, not a data condition.
    */
  def compute(codes: ArrayData, dtab: ArrayData): Double = {
    val m = codes.numElements()
    if (m == 0) return 0.0
    val n = dtab.numElements()
    val ksub = n / m
    if (ksub * m != n)
      throw new IllegalArgumentException(
        s"ADC table length $n is not a multiple of code count $m")
    var acc = 0.0
    var sub = 0
    while (sub < m) {
      val c = codes.getInt(sub)
      if (c < 0 || c >= ksub)
        throw new IllegalArgumentException(
          s"PQ code $c at subspace $sub outside dense codebook [0, $ksub)")
      acc += dtab.getDouble(sub * ksub + c)
      sub += 1
    }
    acc
  }

  def adc(codes: Column, dtab: Column): Column =
    ColumnBridge.column(AdcDistance(ColumnBridge.expression(codes), ColumnBridge.expression(dtab)))
}

/** Native normalize→int8-quantize codes (the int8-ANN scan path):
  * bit-identical to the HOF composition
  * `quantizeInt8(l2normalize(v)).q.cast(array<double>)` — same
  * float→double widening, same sequential norm fold, the same
  * string-BigDecimal HALF_UP round Spark's `round(x, 0)` applies, the
  * same int truncation — but in one tight codegen'd loop instead of
  * five interpreted per-element lambda passes (property-tested
  * bit-for-bit, and the DuckDB oracle still matches).
  */
case class Int8CodesExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"int8_codes needs a float/double array, got ${other.catalogString}")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    Int8CodesExpr.compute(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.Int8CodesExpr.compute($c, $isFloat);")

  override protected def withNewChildInternal(newChild: Expression): Int8CodesExpr =
    copy(child = newChild)

  override def prettyName: String = "int8_codes"
}

object Int8CodesExpr {

  def compute(v: ArrayData, isFloat: Boolean): ArrayData = {
    val n = v.numElements()
    val d = new Array[Double](n)
    var i = 0
    var s = 0.0
    while (i < n) {
      d(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      s += d(i) * d(i)
      i += 1
    }
    val norm = math.sqrt(s)
    var maxAbs = 0.0
    i = 0
    while (i < n) {
      if (norm != 0.0) d(i) = d(i) / norm
      val a = math.abs(d(i))
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val out = new Array[Double](n)
    if (maxAbs != 0.0) {
      val scale = maxAbs / 127.0
      i = 0
      while (i < n) {
        // Spark round(x, 0) on double: string-valueOf BigDecimal,
        // HALF_UP; the int cast then truncates the rounded double
        out(i) = java.math.BigDecimal.valueOf(d(i) / scale)
          .setScale(0, java.math.RoundingMode.HALF_UP)
          .doubleValue().toInt.toDouble
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  def int8Codes(v: Column): Column =
    ColumnBridge.column(Int8CodesExpr(ColumnBridge.expression(v)))
}
