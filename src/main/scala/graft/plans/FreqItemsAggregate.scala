package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch (frequent-items candidates) as a
  * native aggregate.
  *
  * The exact "which tokens exceed x% of the corpus" query is a full
  * token groupBy — at 100 TB that shuffles one row per DISTINCT token
  * per partition. This sketch keeps at most `k` counters per partial
  * aggregate, so a constant k·|partitions| rows reach the shuffle, and
  * merges preserve the classic MG guarantee: **every item with true
  * frequency > N/(k+1) is present in the final candidate set** (N =
  * non-null input rows), regardless of partition count or merge order.
  *
  * What IS merge-order-dependent is the set of sub-threshold survivors
  * and their residual counts — so `eval` exposes only the candidate
  * item set (sorted), and callers that need a deterministic result
  * confirm candidates with a second exact pass filtered to them (see
  * `TextFunctions.heavyHitters`): guarantee ⇒ the confirmed set equals
  * the true heavy set under any execution.
  *
  * update is O(1) amortized (each decrement-all is paid for by the k
  * increments that preceded it); merge adds counters then subtracts the
  * (k+1)-th largest count from all — the standard MG summary merge
  * (Agarwal et al., "Mergeable Summaries", PODS'12).
  */
case class FreqItemsAggregate(child: Expression, k: Int,
                              mutableAggBufferOffset: Int = 0,
                              inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.HashMap[String, Long]] {

  require(k > 0, "freq_candidates requires k > 0")
  private type Buf = scala.collection.mutable.HashMap[String, Long]

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): Buf = new Buf

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v == null) return buf
    // copy out of the (possibly reused) UnsafeRow-backed UTF8String
    val s = v.toString
    buf.get(s) match {
      case Some(c) => buf.update(s, c + 1)
      case None if buf.size < k => buf.update(s, 1L)
      case None =>
        // decrement-all: drop one occurrence of every tracked item AND
        // the incoming one (net error per input row ≤ 1/(k+1) of N)
        val dead = List.newBuilder[String]
        buf.foreach { case (key, c) =>
          if (c == 1L) dead += key else buf.update(key, c - 1) }
        dead.result().foreach(buf.remove)
    }
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    other.foreach { case (s, c) => buf.update(s, buf.getOrElse(s, 0L) + c) }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count from everything; ≤ k
      // strictly-greater counters survive
      val d = buf.values.toArray.sortInPlaceWith(_ > _).apply(k)
      val dead = List.newBuilder[String]
      buf.foreach { case (key, c) =>
        if (c <= d) dead += key else buf.update(key, c - d) }
      dead.result().foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: Buf): Any = new GenericArrayData(
    buf.keysIterator.toArray.sorted
      .map(s => UTF8String.fromString(s): Any))

  override def serialize(buf: Buf): Array[Byte] = {
    val items = buf.toArray
    val bytes = items.map { case (s, _) => s.getBytes("UTF-8") }
    val bb = java.nio.ByteBuffer.allocate(
      4 + bytes.map(_.length + 12).sum)
    bb.putInt(items.length)
    items.indices.foreach { i =>
      bb.putInt(bytes(i).length); bb.put(bytes(i)); bb.putLong(items(i)._2)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Buf
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.update(new String(arr, "UTF-8"), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): FreqItemsAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqItemsAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): FreqItemsAggregate =
    copy(child = c(0))
  override def prettyName: String = "freq_candidates"
}

object FreqItemsAggregate {
  /** Column API: sorted candidate items — a guaranteed superset of
    * every item with frequency > N/(k+1).
    */
  def freqCandidates(item: Column, k: Int): Column =
    ColumnBridge.column(
      FreqItemsAggregate(ColumnBridge.expression(item.cast("string")), k)
        .toAggregateExpression())
}
