package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Bloom-filter shingle test: per document, the count of
  * DISTINCT word n-grams and how many of them hit a fixed Bloom bitset
  * — the corpus-side pass of Bloom decontamination, fused into ONE
  * whole-stage-codegen call per row.
  *
  * Semantics are bit-identical to the composed form
  * (`DedupFunctions.textShingles` + md5 double-hash probes — property-
  * tested in BloomDecontamSpec) and therefore to the DuckDB oracle:
  *  - text is lowered via `UTF8String.toLowerCase` (== `lower()`),
  *    space-trimmed, split on Java-\s runs with Spark `split` limit -1
  *    semantics (leading/trailing ws runs each yield one empty field;
  *    empty text → one empty token);
  *  - grams are the DISTINCT single-space-joined token windows; fewer
  *    than n tokens → the whole token list as one gram;
  *  - probe positions are Kirsch–Mitzenmacher double hashes over ONE
  *    md5 of the gram string: h1/h2 = the digest's first/second 32
  *    bits, position_s = (h1 + s·h2) mod mBits.
  *
  * Exists because the composed HOF chain (`transform` + `slice` +
  * `array_join`, then an md5 + conv probe per element) evaluates its
  * lambdas INTERPRETED with no common-subexpression elimination —
  * measured 4.1 s at sf0.1 where this expression runs the identical
  * math in one array-free pass. The bitset ships inside the expression
  * (mBits/8 bytes, reference-carried into codegen), so the scan stays
  * join-free and shuffle-free at any corpus size.
  */
case class BloomShingleStatsExpr(child: Expression, n: Int, seeds: Int,
                                 mBits: Int, words: Array[Long])
    extends UnaryExpression {

  require(n >= 1, "bloom_shingle_stats: need n >= 1")
  require(seeds >= 1, "bloom_shingle_stats: need seeds >= 1")
  require(mBits >= 64 && mBits % 64 == 0 && words.length == mBits / 64,
    s"bloom_shingle_stats: bitset must be mBits/64 longs")

  override def dataType: DataType = StructType(Seq(
    StructField("n_shingles", LongType, nullable = false),
    StructField("n_hit", LongType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_shingle_stats needs string, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    BloomShingleStatsExpr.compute(
      input.asInstanceOf[UTF8String], n, seeds, mBits, words)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wordsRef = ctx.addReferenceObj("bloomWords", words, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.BloomShingleStatsExpr.compute(" +
        s"$c, $n, $seeds, $mBits, $wordsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomShingleStatsExpr =
    copy(child = newChild)

  override def prettyName: String = "bloom_shingle_stats"
}

object BloomShingleStatsExpr {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def isWs(b: Int): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  def compute(text: UTF8String, n: Int, seeds: Int, mBits: Int,
              words: Array[Long]): InternalRow = {
    // lower the WHOLE text first (lower ∘ trim ≡ trim ∘ lower — trim
    // only strips 0x20, which lowering preserves), then tokenize the
    // lowered bytes: gram bytes are then exact slices of this buffer
    val bytes = text.toLowerCase.getBytes
    var lo = 0
    var hi = bytes.length
    while (lo < hi && bytes(lo) == ' ') lo += 1
    while (hi > lo && bytes(hi - 1) == ' ') hi -= 1

    // token byte ranges, Spark-split(limit -1) semantics; empty fields
    // are zero-length ranges
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    if (hi == lo) { starts.add(lo); ends.add(lo) }
    else {
      var i = lo
      if (isWs(bytes(i) & 0xff)) { starts.add(i); ends.add(i) }
      while (i < hi) {
        while (i < hi && isWs(bytes(i) & 0xff)) i += 1
        if (i < hi) {
          val s = i
          while (i < hi && !isWs(bytes(i) & 0xff)) i += 1
          starts.add(s); ends.add(i)
        }
      }
      if (isWs(bytes(hi - 1) & 0xff)) { starts.add(hi); ends.add(hi) }
    }

    val nTok = starts.size
    val nWin = if (nTok < n) 1 else nTok - n + 1
    val width = if (nTok < n) nTok else n
    val seen = new java.util.HashSet[UTF8String]()
    val digest = md.get()
    var nHit = 0L
    var w = 0
    while (w < nWin) {
      // gram bytes: tokens w .. w+width-1 joined by a single space
      var len = width - 1
      var t = w
      while (t < w + width) { len += ends.get(t) - starts.get(t); t += 1 }
      val gb = new Array[Byte](math.max(len, 0))
      var o = 0
      t = w
      while (t < w + width) {
        if (t > w) { gb(o) = ' '; o += 1 }
        val s = starts.get(t); val e = ends.get(t)
        System.arraycopy(bytes, s, gb, o, e - s)
        o += e - s
        t += 1
      }
      if (seen.add(UTF8String.fromBytes(gb))) {
        digest.reset()
        val d = digest.digest(gb)
        val h1 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        val h2 = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
          ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
        var s = 0
        var all = true
        while (all && s < seeds) {
          val p = (h1 + s.toLong * h2) % mBits
          if (((words((p >>> 6).toInt) >>> (p & 63L).toInt) & 1L) == 0L)
            all = false
          s += 1
        }
        if (all) nHit += 1
      }
      w += 1
    }
    new GenericInternalRow(Array[Any](seen.size.toLong, nHit))
  }

  /** Struct column (n_shingles, n_hit) for `text` (see class doc). */
  def stats(text: Column, n: Int, seeds: Int, mBits: Int,
            words: Array[Long]): Column =
    ColumnBridge.column(BloomShingleStatsExpr(
      ColumnBridge.expression(text), n, seeds, mBits, words))
}
