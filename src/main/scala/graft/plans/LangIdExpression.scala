package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native stopword-overlap language ID over a token array.
  *
  * Identical decision rule to the composed form in
  * [[graft.functions.TextFunctions.langId]]: per language, count tokens
  * in its stopword set; answer is the argmax, ties broken by
  * lexicographically larger language code (== Spark's struct-max over
  * (hits, lang)); zero hits everywhere → "und". One hash-set probe per
  * token instead of one interpreted array pass per language.
  */
case class LangIdExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lang_id needs array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    LangIdExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.LangIdExpr.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)

  override def prettyName: String = "lang_id"
}

object LangIdExpr {

  // language codes sorted ascending — ties resolve to the LAST match
  private val langs: Array[String] =
    graft.functions.TextFunctions.stopwords.keys.toArray.sorted
  // token → bitmask of languages whose stopword set contains it
  private val tokenMask: java.util.HashMap[UTF8String, Int] = {
    val m = new java.util.HashMap[UTF8String, Int]()
    langs.zipWithIndex.foreach { case (lang, i) =>
      graft.functions.TextFunctions.stopwords(lang).foreach { w =>
        val k = UTF8String.fromString(w)
        m.merge(k, 1 << i, (a, b) => Integer.valueOf(a | b))
      }
    }
    m
  }
  private val und = UTF8String.fromString("und")
  private val langU8: Array[UTF8String] = langs.map(UTF8String.fromString)

  def compute(tokens: ArrayData): UTF8String = {
    val hits = new Array[Int](langs.length)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (t != null) {
        val mask = tokenMask.getOrDefault(t, 0)
        if (mask != 0) {
          var l = 0
          while (l < langs.length) {
            if ((mask & (1 << l)) != 0) hits(l) += 1
            l += 1
          }
        }
      }
      i += 1
    }
    // argmax, ties → larger language code (struct-max semantics)
    var best = -1
    var bestHits = 0
    var l = 0
    while (l < langs.length) {
      if (hits(l) >= bestHits && hits(l) > 0) { best = l; bestHits = hits(l) }
      l += 1
    }
    if (best < 0) und else langU8(best)
  }

  def langId(tokens: Column): Column =
    ColumnBridge.column(LangIdExpr(ColumnBridge.expression(tokens)))
}
