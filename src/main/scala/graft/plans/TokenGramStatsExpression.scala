package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass token/gram statistics for the repetition + Gopher quality
  * signals: `struct(n_tok, max_tok_count, n_grams, n_distinct_grams,
  * sum_tok_len, n_alpha_words)` over the
  * whitespace tokens of the space-trimmed, `lower()`-cased text
  * (identical token semantics to [[ShingleHashExpr]], Java-split edge
  * cases included; pure-ASCII tokens take a zero-allocation byte loop,
  * non-ASCII tokens go through `UTF8String.toLowerCase` so lengths,
  * alpha flags and counts match the `tokens(lower(text))` pipelines on
  * any corpus).
  *
  * Replaces the composed HOF forms of `topTokenFraction` (which filters
  * the full token array once per DISTINCT token — O(d·t) interpreted
  * lambda evaluations per row) and `dupNgramFraction` (gram strings
  * materialized per row). Counting hashes instead of strings preserves
  * every count (injective in practice), so the derived fractions are
  * bit-identical to the string forms the oracle replays.
  */
case class TokenGramStatsExpr(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "token_gram_stats: need n >= 1")

  override def dataType: DataType = TokenGramStatsExpr.schema

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"token_gram_stats needs string, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    TokenGramStatsExpr.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.TokenGramStatsExpr.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): TokenGramStatsExpr =
    copy(child = newChild)

  override def prettyName: String = "token_gram_stats"
}

object TokenGramStatsExpr {

  val schema: StructType = StructType(Seq(
    StructField("n_tok", LongType, nullable = false),
    StructField("max_tok_count", LongType, nullable = false),
    StructField("n_grams", LongType, nullable = false),
    StructField("n_distinct_grams", LongType, nullable = false),
    StructField("sum_tok_len", LongType, nullable = false),
    StructField("n_alpha_words", LongType, nullable = false),
    // chars matching [A-Za-z ] over the FULL (untrimmed) text — the
    // count length(regexp_replace(text, '[^A-Za-z ]', '')) produces,
    // without the regex pass or the scrubbed-copy allocation; feeds
    // TextFunctions.qualityScore's alpha ratio
    StructField("n_alpha_space_chars", LongType, nullable = false)))

  private final val GramBase = 1000003L

  private def isWs(b: Int): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  def compute(text: UTF8String, n: Int): InternalRow = {
    val bytes = text.getBytes
    // alpha-space chars over the FULL text (each match is a single
    // ASCII byte, so the byte count equals the char count on any UTF-8)
    var alphaSpace = 0L
    var ai = 0
    while (ai < bytes.length) {
      val c = bytes(ai) & 0xff
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || c == ' ') alphaSpace += 1
      ai += 1
    }
    var lo = 0
    var hi = bytes.length
    while (lo < hi && bytes(lo) == ' ') lo += 1
    while (hi > lo && bytes(hi - 1) == ' ') hi -= 1

    // Spark-split (Pattern.split limit -1) semantics: leading AND
    // trailing whitespace runs each yield one empty field (see
    // ShingleHashExpr — Java's default split drops trailing empties,
    // Spark's split keeps them)
    val tokBuf = new java.util.ArrayList[java.lang.Long]()
    var sumLen = 0L
    var nAlpha = 0L
    if (hi == lo) tokBuf.add(0L)
    else {
      var i = lo
      if (isWs(bytes(i) & 0xff)) tokBuf.add(0L)
      while (i < hi) {
        while (i < hi && isWs(bytes(i) & 0xff)) i += 1
        if (i < hi) {
          val start = i
          var h = 0L
          var len = 0L
          var hasAlpha = false
          var ascii = true
          while (i < hi && !isWs(bytes(i) & 0xff)) {
            val b = bytes(i) & 0xff
            if (b >= 0x80) ascii = false
            val c = if (b >= 'A' && b <= 'Z') b + 32 else b
            if (c >= 'a' && c <= 'z') hasAlpha = true
            h = h * 31L + c
            len += 1
            i += 1
          }
          if (!ascii) {
            // non-ASCII token: length is codepoints of the lower()-cased
            // token, hash/alpha over its UTF-8 bytes (Spark-lowering via
            // ShingleHashExpr.lowered — shared slow path)
            val tok = ShingleHashExpr.lowered(bytes, start, i)
            val tb = tok.getBytes
            h = ShingleHashExpr.hashBytes(tb)
            len = tok.numChars().toLong
            hasAlpha = false
            var j = 0
            while (j < tb.length) {
              if (tb(j) >= 'a' && tb(j) <= 'z') hasAlpha = true
              j += 1
            }
          }
          tokBuf.add(h)
          sumLen += len
          if (hasAlpha) nAlpha += 1
        }
      }
      if (isWs(bytes(hi - 1) & 0xff)) tokBuf.add(0L)
    }

    val nTok = tokBuf.size
    val counts = new java.util.HashMap[java.lang.Long, Long](nTok * 2)
    var maxCnt = 0L
    var ti = 0
    while (ti < nTok) {
      val c = counts.merge(tokBuf.get(ti), 1L, (a, b) => a + b)
      if (c > maxCnt) maxCnt = c
      ti += 1
    }

    var nGrams = 0L
    var nDistinct = 0L
    if (nTok >= n) {
      nGrams = (nTok - n + 1).toLong
      val seen = new java.util.HashSet[java.lang.Long](nTok * 2)
      var top = 1L
      var p = 0
      while (p < n - 1) { top *= GramBase; p += 1 }
      var g = 0L
      var i = 0
      while (i < nTok) {
        if (i < n) {
          g = g * GramBase + tokBuf.get(i)
          if (i == n - 1) seen.add(g)
        } else {
          g = (g - tokBuf.get(i - n) * top) * GramBase + tokBuf.get(i)
          seen.add(g)
        }
        i += 1
      }
      nDistinct = seen.size.toLong
    }
    InternalRow(nTok.toLong, maxCnt, nGrams, nDistinct, sumLen, nAlpha, alphaSpace)
  }

  def stats(text: Column, n: Int): Column =
    ColumnBridge.column(TokenGramStatsExpr(ColumnBridge.expression(text), n))
}
