package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{AbstractDataType, AnyDataType, BooleanType, DataType}

/** Marker predicate for interval overlap: `[s1,e1] ∩ [s2,e2] ≠ ∅`.
  *
  * Self-sufficient — evaluates (and codegens) as the plain conjunction
  * `s1 <= e2 && e1 >= s2`, so a query is CORRECT whether or not the
  * optimizer rewrites it. [[BinnedIntervalJoinRule]] pattern-matches on
  * this node inside join conditions and, when both sides are too big to
  * broadcast, rewrites the join into the canonical-bin equi-join shape.
  * (The marker-function + rewrite-rule split is how engines keep
  * rewrites opt-in and fallback-safe.)
  */
case class RangeOverlap(s1: Expression, e1: Expression,
                        s2: Expression, e2: Expression) extends Predicate {

  override def children: Seq[Expression] = Seq(s1, e1, s2, e2)
  override def nullable: Boolean = children.exists(_.nullable)
  override def dataType: DataType = BooleanType

  @transient private lazy val ord =
    org.apache.spark.sql.catalyst.util.TypeUtils.getInterpretedOrdering(s1.dataType)

  override def eval(input: InternalRow): Any = {
    val a = s1.eval(input); val b = e1.eval(input)
    val c = s2.eval(input); val d = e2.eval(input)
    if (a == null || b == null || c == null || d == null) null
    else java.lang.Boolean.valueOf(ord.lteq(a, d) && ord.gteq(b, c))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // delegate to the equivalent conjunction — stays in codegen
    val equiv = expanded
    val code = equiv.genCode(ctx)
    ExprCode(code.code, code.isNull, code.value)
  }

  /** The plain predicate this marker is equivalent to. */
  def expanded: Expression = {
    import org.apache.spark.sql.catalyst.expressions.{And, GreaterThanOrEqual, LessThanOrEqual}
    And(LessThanOrEqual(s1, e2), GreaterThanOrEqual(e1, s2))
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): RangeOverlap =
    RangeOverlap(c(0), c(1), c(2), c(3))

  override def prettyName: String = "range_overlap"
}

object RangeOverlap {
  def apply(s1: Column, e1: Column, s2: Column, e2: Column): Column =
    ColumnBridge.column(new RangeOverlap(
      ColumnBridge.expression(s1), ColumnBridge.expression(e1),
      ColumnBridge.expression(s2), ColumnBridge.expression(e2)))
}
