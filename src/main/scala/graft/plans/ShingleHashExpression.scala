package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native token-n-gram hash set: the DISTINCT 64-bit hashes of a
  * document's whitespace-token n-grams, one O(len) pass per row.
  *
  * Hash-set semantics mirror [[graft.functions.TextFunctions.shingles]]
  * exactly (so `count distinct` over these hashes equals `count
  * distinct` over the string shingles, collision-negligibly):
  *  - the text is space-trimmed, ASCII-lowercased, and split on runs of
  *    Java-\s whitespace; leading AND trailing runs each yield one
  *    empty token (Spark split = Pattern.split limit -1 — property-
  *    tested against the composed form);
  *  - with fewer than n tokens the WHOLE token list is the single gram
  *    (the `array_join(toks, " ")` branch of `shingles`);
  *  - token hash = base-31 polynomial over byte codes; gram hash = base-
  *    1000003 polynomial over token hashes with 64-bit wrap-around, so
  *    an injective-in-practice stand-in for the joined gram string.
  *
  * Exists because the composed HOF form (`transform`+`slice`+
  * `array_join` per gram) interprets its lambdas per element and
  * materializes every gram STRING; downstream joins then broadcast and
  * shuffle those strings. This expression inlines into whole-stage
  * codegen and the join key becomes one long — at 100 TB the
  * decontamination join's build side shrinks ~5× and the probe stream
  * never allocates gram strings at all. Lowering matches Spark's
  * `lower()` exactly: pure-ASCII tokens take a zero-allocation byte
  * loop; a token containing any non-ASCII byte is lowered via
  * `UTF8String.toLowerCase` (bit-identical to `lower()` by
  * construction) and hashed over the lowered bytes, so the hash set
  * stays consistent with pipelines built on `tokens(lower(text))` for
  * any corpus, not just ASCII.
  */
case class ShingleHashExpr(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "shingle_hashes: need n >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_hashes needs string, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    ShingleHashExpr.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.ShingleHashExpr.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashExpr =
    copy(child = newChild)

  override def prettyName: String = "shingle_hashes"
}

object ShingleHashExpr {

  private final val GramBase = 1000003L

  private def isWs(b: Int): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** Spark-`lower()`-identical lowering of the token at bytes[from,until):
    * goes through `UTF8String.toLowerCase` itself, so any Unicode corpus
    * hashes the exact tokens `tokens(lower(text))` would produce.
    * Shared with [[TokenGramStatsExpr]].
    */
  private[plans] def lowered(bytes: Array[Byte], from: Int, until: Int): UTF8String =
    UTF8String.fromBytes(bytes, from, until - from).toLowerCase

  /** base-31 polynomial over unsigned bytes — the token hash. */
  private[plans] def hashBytes(tb: Array[Byte]): Long = {
    var h = 0L
    var j = 0
    while (j < tb.length) { h = h * 31L + (tb(j) & 0xff); j += 1 }
    h
  }

  def compute(text: UTF8String, n: Int): ArrayData = {
    val grams = gramSeq(text, n)
    val selected = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < grams.length) { selected.add(grams(i)); i += 1 }
    val out = new Array[Long](selected.size)
    val it = selected.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  /** POSITIONAL gram hashes: document order, duplicates preserved —
    * the array index is the gram's token start position. The span /
    * alignment primitive ([[ShingleHashSeqExpr]]); [[compute]] is its
    * distinct-set projection.
    */
  def computeSeq(text: UTF8String, n: Int): ArrayData =
    new GenericArrayData(gramSeq(text, n))

  private def gramSeq(text: UTF8String, n: Int): Array[Long] = {
    val bytes = text.getBytes
    // space-trim (Spark trim removes 0x20 only)
    var lo = 0
    var hi = bytes.length
    while (lo < hi && bytes(lo) == ' ') lo += 1
    while (hi > lo && bytes(hi - 1) == ' ') hi -= 1

    // token hashes, Spark-split (Pattern.split limit -1) semantics:
    // a leading ws run yields one empty first field AND a trailing ws
    // run yields one empty last field (unlike Java's default split,
    // which drops trailing empties). Empty string → one empty token.
    val tokBuf = new java.util.ArrayList[java.lang.Long]()
    if (hi == lo) tokBuf.add(0L)
    else {
      var i = lo
      if (isWs(bytes(i) & 0xff)) tokBuf.add(0L) // leading empty field
      while (i < hi) {
        while (i < hi && isWs(bytes(i) & 0xff)) i += 1
        if (i < hi) {
          val start = i
          var h = 0L
          var ascii = true
          while (i < hi && !isWs(bytes(i) & 0xff)) {
            val b = bytes(i) & 0xff
            if (b >= 0x80) ascii = false
            val c = if (b >= 'A' && b <= 'Z') b + 32 else b
            h = h * 31L + c
            i += 1
          }
          // non-ASCII token: redo via Spark's own lowering (slow path)
          if (!ascii) h = hashBytes(lowered(bytes, start, i).getBytes)
          tokBuf.add(h)
        }
      }
      if (isWs(bytes(hi - 1) & 0xff)) tokBuf.add(0L) // trailing empty field
    }

    val nTok = tokBuf.size
    if (nTok < n) {
      // whole token list as the single gram (shingles' else-branch)
      var g = 0L
      var i = 0
      while (i < nTok) { g = g * GramBase + tokBuf.get(i); i += 1 }
      Array(g)
    } else {
      // rolling window: g' = (g - h_out·base^(n-1))·base + h_in, exact
      // mod 2^64 via Long wrap-around
      var top = 1L
      var p = 0
      while (p < n - 1) { top *= GramBase; p += 1 }
      val out = new Array[Long](nTok - n + 1)
      var g = 0L
      var i = 0
      while (i < nTok) {
        if (i < n) {
          g = g * GramBase + tokBuf.get(i)
          if (i == n - 1) out(0) = g
        } else {
          g = (g - tokBuf.get(i - n) * top) * GramBase + tokBuf.get(i)
          out(i - n + 1) = g
        }
        i += 1
      }
      out
    }
  }

  /** Distinct n-gram hash array for `text` (see class doc). */
  def shingleHashes(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashExpr(ColumnBridge.expression(text), n))

  /** Positional n-gram hash array: document order, duplicates kept —
    * index i is the hash of the gram starting at token i. Same
    * tokenization/lowering/edge semantics as [[shingleHashes]] (which
    * is this array's distinct-set projection).
    */
  def shingleHashesSeq(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashSeqExpr(ColumnBridge.expression(text), n))
}

/** Positional sibling of [[ShingleHashExpr]]: grams in document order,
  * duplicates preserved — the alignment/span primitive (array index =
  * token start). Shares the token-hash and rolling-gram core.
  */
case class ShingleHashSeqExpr(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "shingle_hashes_seq: need n >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_hashes_seq needs string, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    ShingleHashExpr.computeSeq(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.ShingleHashExpr.computeSeq($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashSeqExpr =
    copy(child = newChild)

  override def prettyName: String = "shingle_hashes_seq"
}
