package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native SimHash over a token array — bit-identical to the composed
  * HOF form it replaces (and to the SQL oracle): bit i votes +1 when
  * hex digit i of md5(token) has its high bit set (nibble ≥ 8), −1
  * otherwise, over the DISTINCT tokens; a null element votes −1 on
  * every bit (what `md5(null)`'s three-valued fold did). The HOF form
  * interpreted `aggregate`+`zip_with` lambdas per token per bit and
  * re-parsed 16 substrings of the md5 hex string; this is one digest
  * and one nibble scan per distinct token, inlined by codegen.
  */
case class SimHashExpr(child: Expression, bits: Int) extends UnaryExpression {

  require(bits >= 1 && bits <= 32, "simhash: need 1 <= bits <= 32 (md5 has 32 hex digits)")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash needs array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    SimHashExpr.compute(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SimHashExpr.compute($c, $bits);")

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)

  override def prettyName: String = "simhash_native"
}

object SimHashExpr {

  private val digestTL = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(elems: ArrayData, bits: Int): Long = {
    val n = elems.numElements()
    val votes = new Array[Long](bits)
    val seen = new java.util.HashSet[AnyRef](n * 2)
    var sawNull = false
    var i = 0
    while (i < n) {
      if (elems.isNullAt(i)) {
        // one distinct null element votes −1 everywhere (once)
        if (!sawNull) {
          sawNull = true
          var b = 0
          while (b < bits) { votes(b) -= 1L; b += 1 }
        }
      } else {
        val tok = elems.getUTF8String(i)
        if (seen.add(tok)) {
          val md = digestTL.get()
          md.reset()
          val dig = md.digest(tok.getBytes)
          var b = 0
          while (b < bits) {
            // hex digit b = high or low nibble of byte b/2; high bit of
            // the nibble == "digit >= 8"
            val nib =
              if ((b & 1) == 0) (dig(b >> 1) >> 4) & 0xf
              else dig(b >> 1) & 0xf
            votes(b) += (if (nib >= 8) 1L else -1L)
            b += 1
          }
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }

  def simhash(elems: Column, bits: Int): Column =
    ColumnBridge.column(SimHashExpr(ColumnBridge.expression(elems), bits))
}
