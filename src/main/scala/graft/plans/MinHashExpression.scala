package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native k-component minhash over a token array (SURVEY §2.11 / the
  * dedup scale path).
  *
  * Hash family: ONE md5 per token, split into two unsigned 64-bit
  * halves (h1, h2); component i is the min over tokens of
  * `(h1 + i·h2) mod 2^64` (Kirsch–Mitzenmacher double hashing — the
  * standard way to derive k hash functions from one digest), rendered
  * as 16-char lower hex so the unsigned numeric order IS the string
  * order every engine agrees on. The previous family computed k FULL
  * md5 digests per token ("<seed>:token"); at k=16 that made digest
  * cost 16× the tokenization cost (measured 10.7 s for 50k docs at the
  * 10× smoke — digest-bound, not scan-bound). One digest + k adds is
  * ~k× cheaper and remains md5-anchored, so the DuckDB oracle replays
  * it exactly (substring the hex, UBIGINT/HUGEINT arithmetic, to_hex).
  * Computed in ONE pass over the array; participates in whole-stage
  * codegen via a static-call `doGenCode`.
  */
case class MinHashSignature(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature needs array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.MinHashSignature.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)

  override def prettyName: String = "minhash_signature"
}

object MinHashSignature {

  private val hexDigits = "0123456789abcdef".toCharArray

  /** Big-endian unsigned 64-bit read of digest[off, off+8) — matches
    * parsing the corresponding 16 hex chars of md5's hex form.
    */
  private def be64(d: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(off + i) & 0xffL); i += 1 }
    v
  }

  /** One pass: ONE md5 per token → (h1, h2) halves; per component i,
    * track the unsigned min of h1 + i·h2 (Long arithmetic wraps mod
    * 2^64 — exactly the HUGEINT-mod the oracle computes). Hex-encode at
    * the end. Static so generated code can call it directly.
    */
  def compute(tokens: ArrayData, k: Int): ArrayData = {
    val md = MessageDigest.getInstance("MD5")
    val mins = new Array[Long](k)
    var any = false
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val tok = tokens.getUTF8String(i)
      if (tok != null) {
        md.reset()
        val digest = md.digest(tok.getBytes)
        val h1 = be64(digest, 0)
        val h2 = be64(digest, 8)
        if (!any) {
          var s = 0
          while (s < k) { mins(s) = h1 + s.toLong * h2; s += 1 }
          any = true
        } else {
          var s = 0
          while (s < k) {
            val v = h1 + s.toLong * h2
            if (java.lang.Long.compareUnsigned(v, mins(s)) < 0) mins(s) = v
            s += 1
          }
        }
      }
      i += 1
    }
    val out = new Array[Any](k)
    var s = 0
    while (s < k) {
      out(s) = UTF8String.fromString(if (!any) "" else hex64(mins(s)))
      s += 1
    }
    new GenericArrayData(out)
  }

  /** 16-char lower-hex of an unsigned 64-bit value (zero-padded). */
  private def hex64(v: Long): String = {
    val sb = new java.lang.StringBuilder(16)
    var shift = 60
    while (shift >= 0) {
      sb.append(hexDigits(((v >>> shift) & 0xf).toInt))
      shift -= 4
    }
    sb.toString
  }

  /** Column builder (usable without SQL registration). */
  def signature(tokens: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(tokens), k))
  }
}
