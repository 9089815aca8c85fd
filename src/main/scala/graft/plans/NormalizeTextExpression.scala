package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonicalization for dedup keys, as a native codegen'd
  * expression (no UDF): NFC-normalize (composed and decomposed accent
  * encodings of the same glyph become byte-identical — the #1 cause of
  * "distinct" crawl duplicates), lowercase (root locale), optionally
  * fold ASCII punctuation runs to spaces, collapse whitespace runs to a
  * single space, trim. The exact pipeline DuckDB replays as
  * `trim(regexp_replace(regexp_replace(lower(nfc_normalize(s)),
  * '[[:punct:]]+', ' ', 'g'), '[[:space:]]+', ' ', 'g'))` — Java's
  * `\p{Punct}`/`\s` and RE2's POSIX classes agree on the ASCII ranges
  * used here.
  *
  * Runs scan-side inside whole-stage codegen; the canonical key (or its
  * digest) is what shuffles, never re-normalized text downstream.
  */
case class NormalizeTextExpr(child: Expression, stripPunct: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"normalize_text needs string, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    NormalizeTextExpr.compute(input.asInstanceOf[UTF8String], stripPunct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.NormalizeTextExpr.compute($c, $stripPunct);")

  override protected def withNewChildInternal(newChild: Expression): NormalizeTextExpr =
    copy(child = newChild)

  override def prettyName: String = "normalize_text"
}

object NormalizeTextExpr {

  private val punct = java.util.regex.Pattern.compile("\\p{Punct}+")
  private val ws = java.util.regex.Pattern.compile("\\s+")

  def compute(s: UTF8String, stripPunct: Boolean): UTF8String = {
    val nfc = java.text.Normalizer.normalize(s.toString,
      java.text.Normalizer.Form.NFC)
    val lower = nfc.toLowerCase(java.util.Locale.ROOT)
    val folded = if (stripPunct) punct.matcher(lower).replaceAll(" ") else lower
    UTF8String.fromString(ws.matcher(folded).replaceAll(" ").trim)
  }

  def normalizeText(text: Column, stripPunct: Boolean = true): Column =
    ColumnBridge.column(
      NormalizeTextExpr(ColumnBridge.expression(text), stripPunct))
}
