package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprint (rolling k-gram hash + window minima —
  * Schleimer/Wilkerson/Aiken's MOSS scheme): every window of `w`
  * consecutive k-gram hashes contributes its minimum, so two documents
  * sharing a run of ≥ w+k−1 characters share a selected hash while only
  * ~1/w of positions survive. Returns the sorted distinct selection as
  * `array<bigint>`.
  *
  * Semantics (kept engine-portable so a SQL oracle can replay them):
  *  - chars outside printable ASCII [0x20,0x7e] are DROPPED first, then
  *    ASCII-lowercased (unicode lowering differs between engines);
  *  - k-gram hash = base-31 polynomial over char codes, no modulus —
  *    k ≤ 6 keeps the value < 2^63 so it is exact in any 64-bit engine;
  *  - fewer than w hashes → the single global minimum; empty → empty.
  *
  * A composed higher-order-function form is O(n³) per row: interpreted
  * lambdas re-evaluate the `codes`/`hashes` subtrees on every
  * element_at/slice reference (no CSE inside HOFs). This expression is
  * one O(n) pass per row with a w-sized ring buffer, inlined by
  * whole-stage codegen.
  */
case class WinnowExpr(child: Expression, k: Int, w: Int) extends UnaryExpression {

  require(k >= 2 && k <= 6 && w >= 1, "winnow: need 2 <= k <= 6, w >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow needs string, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    WinnowExpr.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.WinnowExpr.compute($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowExpr =
    copy(child = newChild)

  override def prettyName: String = "winnow"
}

object WinnowExpr {

  def compute(text: UTF8String, k: Int, w: Int): ArrayData = {
    // printable-ASCII strip + lowercase in one pass
    val bytes = text.getBytes
    val cleaned = new Array[Int](bytes.length)
    var n = 0
    var bi = 0
    while (bi < bytes.length) {
      val b = bytes(bi) & 0xff
      if (b >= 0x20 && b <= 0x7e) {
        cleaned(n) = if (b >= 'A' && b <= 'Z') b + 32 else b
        n += 1
      }
      bi += 1
    }
    val nGrams = n - (k - 1)
    if (nGrams <= 0) return new GenericArrayData(Array.emptyLongArray)

    // base-31 powers for the k-gram polynomial
    var top = 1L
    var p = 0
    while (p < k - 1) { top *= 31L; p += 1 }

    val selected = new java.util.TreeSet[java.lang.Long]()
    val ring = new Array[Long](w) // last w hashes
    var h = 0L
    var i = 0
    while (i < n) {
      if (i < k - 1) {
        h = h * 31L + cleaned(i)
      } else {
        h = if (i == k - 1) h * 31L + cleaned(i)
            else (h - cleaned(i - k) * top) * 31L + cleaned(i)
        val g = i - (k - 1) // gram index 0..nGrams-1
        ring(g % w) = h
        if (g >= w - 1 || g == nGrams - 1) {
          // window minimum over the ring's valid prefix (full once g >= w-1)
          val m = math.min(w, g + 1)
          var best = Long.MaxValue
          var j = 0
          while (j < m) { if (ring(j) < best) best = ring(j); j += 1 }
          selected.add(best)
        }
      }
      i += 1
    }
    val out = new Array[Long](selected.size)
    val it = selected.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  def winnow(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowExpr(ColumnBridge.expression(text), k, w))
}
