package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k-per-group aggregate (O4 family at scale).
  *
  * The window formulation (`row_number().over(partitionBy(key).orderBy
  * (score))` then `rn <= k`) SORTS every row of every group; this
  * aggregate keeps a k-bounded buffer per group instead — O(n·log k)
  * with map-side partial aggregation, so only k rows per (partition,
  * group) ever reach the shuffle. At 100 TB that is the difference
  * between shuffling the table and shuffling k·|groups| rows.
  *
  * Semantics: top `k` (score, id) pairs, score descending (or
  * ascending), ties broken by id ascending — the same deterministic
  * total order the engine's window-based queries use. Returns
  * `array<struct<score double, id bigint>>` sorted in rank order.
  */
case class TopKAggregate(scoreExpr: Expression, idExpr: Expression, k: Int,
                         desc: Boolean,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[(Double, Long)]] {

  require(k > 0, "top_k requires k > 0")
  private type Buf = scala.collection.mutable.ArrayBuffer[(Double, Long)]

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)

  /** rank order: better-first. */
  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    if (a._1 != b._1) { if (desc) a._1 > b._1 else a._1 < b._1 }
    else a._2 < b._2

  override def createAggregationBuffer(): Buf = new Buf(k + 1)

  private def insert(buf: Buf, e: (Double, Long)): Buf = {
    // k is small by contract (top-k); linear insert keeps the buffer
    // sorted better-first and bounds both time and state at k
    var i = buf.length
    while (i > 0 && better(e, buf(i - 1))) i -= 1
    if (i < k) {
      buf.insert(i, e)
      if (buf.length > k) buf.remove(k)
    }
    buf
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val s = scoreExpr.eval(input)
    val id = idExpr.eval(input)
    if (s == null || id == null) buf
    else insert(buf, (s.asInstanceOf[Double], id.asInstanceOf[Long]))
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    other.foreach(e => insert(buf, e))
    buf
  }

  override def eval(buf: Buf): Any = new GenericArrayData(
    buf.map(e => InternalRow(e._1, e._2)).toArray[Any])

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.length * 16)
    bb.putInt(buf.length)
    buf.foreach { case (s, id) => bb.putDouble(s); bb.putLong(id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Buf(n)
    var i = 0
    while (i < n) { buf += ((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKAggregate =
    copy(scoreExpr = c(0), idExpr = c(1))
  override def prettyName: String = "top_k"
}

object TopKAggregate {
  /** Column API: top-k (score, id) pairs per group, rank order. */
  def topK(score: Column, id: Column, k: Int, desc: Boolean = true): Column =
    ColumnBridge.column(
      TopKAggregate(ColumnBridge.expression(score.cast("double")),
        ColumnBridge.expression(id.cast("long")), k, desc)
        .toAggregateExpression())

  /** The exploded (score, id, rank) form — drop-in for the window+
    * row_number pattern, same deterministic tie-break.
    */
  def topKExploded(df: org.apache.spark.sql.DataFrame, groupCols: Seq[String],
                   score: Column, id: Column, k: Int,
                   descending: Boolean = true): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    df.groupBy(groupCols.map(col): _*)
      .agg(topK(score, id, k, descending).as("__topk"))
      .select(groupCols.map(col) :+ posexplode(col("__topk")).as(Seq("__pos", "__e")): _*)
      .select(groupCols.map(col) ++ Seq(
        col("__e.score").as("score"), col("__e.id").as("id"),
        (col("__pos") + 1).cast("long").as("rank")): _*)
  }
}
