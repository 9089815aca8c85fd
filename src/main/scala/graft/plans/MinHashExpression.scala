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
  * Semantically identical to the composed-expression form in
  * [[graft.functions.DedupFunctions.minhashSignature]] —
  * `min over tokens of md5("<seed>:" + token)` per seed, hex-encoded —
  * but computed in ONE pass over the array with digests compared as
  * unsigned bytes (hex-lowercase order == unsigned byte order), instead
  * of k separate transform+array_min expression trees. Participates in
  * whole-stage codegen via a static-call `doGenCode`.
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

  /** One pass: for each token, k digests; track per-seed minimum as
    * unsigned byte arrays; hex-encode at the end. Static so generated
    * code can call it directly.
    */
  def compute(tokens: ArrayData, k: Int): ArrayData = {
    val md = MessageDigest.getInstance("MD5")
    val mins = new Array[Array[Byte]](k)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val tok = tokens.getUTF8String(i)
      if (tok != null) {
        val tokBytes = tok.getBytes
        var s = 0
        while (s < k) {
          md.reset()
          md.update(seedPrefix(s))
          md.update(tokBytes)
          val digest = md.digest()
          if (mins(s) == null || unsignedLess(digest, mins(s))) mins(s) = digest
          s += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](k)
    var s = 0
    while (s < k) {
      out(s) = UTF8String.fromString(if (mins(s) == null) "" else hex(mins(s)))
      s += 1
    }
    new GenericArrayData(out)
  }

  // "<seed>:" prefixes, cached — seeds are small ints
  private val prefixCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Byte]]()
  private def seedPrefix(s: Int): Array[Byte] =
    prefixCache.computeIfAbsent(s, i => s"$i:".getBytes("UTF-8"))

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    a.length < b.length
  }

  private def hex(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val v = bytes(i) & 0xff
      sb.append(hexDigits(v >>> 4)).append(hexDigits(v & 0xf))
      i += 1
    }
    sb.toString
  }

  /** Column builder (usable without SQL registration). */
  def signature(tokens: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(tokens), k))
  }
}
