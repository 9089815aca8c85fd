package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Point-in-time (as-of) join: for each left row, the single right row
  * with the greatest right timestamp ≤ the left timestamp (backward),
  * or the least right timestamp ≥ it (forward), per join key — the
  * pandas `merge_asof` / DuckDB `ASOF JOIN` operator.
  *
  * Implementation is the union+window trick, NOT a join: tag both
  * sides, union them, and carry the last (resp. first) non-null right
  * payload across a key-partitioned window ordered by timestamp. One
  * shuffle on the join key, no join node, no per-key loop — at 100 TB
  * this is a single Exchange + Sort and scales with ordinary AQE
  * machinery, where a non-equi range join would degenerate to a
  * broadcast-nested-loop or an exploded bin join.
  *
  * Equal timestamps on the two sides match (ties inclusive): the right
  * row sorts before (backward) / after (forward) the left row at the
  * same instant. For fully deterministic output the right side should
  * be unique on (keys, ts); pass `tieBreak` (a right column name) to
  * break residual ties by its largest value.
  */
object AsOfJoin {

  /** Backward as-of join (latest right row at or before left ts).
    *
    * @param rightCols right columns to carry; emitted as `prefix+name`,
    *                  null when no right row qualifies
    * @param tolerance max allowed `leftTs - rightTs` in the ts column's
    *                  own units (e.g. nanos for long-nanos columns);
    *                  matches further back are nulled out
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, rightCols: Seq[String],
               prefix: String = "asof_", tieBreak: Option[String] = None,
               tolerance: Option[Long] = None): DataFrame =
    run(left, right, keys, leftTs, rightTs, rightCols, prefix, tieBreak,
      tolerance, forward = false)

  /** Forward as-of join (earliest right row at or after left ts). */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
              leftTs: String, rightTs: String, rightCols: Seq[String],
              prefix: String = "asof_", tieBreak: Option[String] = None,
              tolerance: Option[Long] = None): DataFrame =
    run(left, right, keys, leftTs, rightTs, rightCols, prefix, tieBreak,
      tolerance, forward = true)

  private def run(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTs: String, rightTs: String, rightCols: Seq[String],
                  prefix: String, tieBreak: Option[String],
                  tolerance: Option[Long], forward: Boolean): DataFrame = {
    val payloadCols = (rightCols :+ rightTs).distinct
    val payloadType = StructType(payloadCols.map(right.schema(_)))
    val leftCarry   = left.columns.filterNot(keys.contains)
    // right rows sort before left at equal ts for backward (so the tie
    // is inclusive), after it for forward
    val (rightSide, leftSide) = if (forward) (1, 0) else (0, 1)

    val taggedLeft = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("__asof_ts"),
        lit(leftSide).as("__asof_side"),
        lit(0L).cast(tieBreak.map(right.schema(_).dataType).getOrElse(
          org.apache.spark.sql.types.LongType)).as("__asof_tie"),
        lit(null).cast(payloadType).as("__asof_r")) ++
        leftCarry.map(c => col(c).as(s"__l_$c")): _*)

    val taggedRight = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__asof_ts"),
        lit(rightSide).as("__asof_side"),
        tieBreak.map(c => col(c).cast(right.schema(c).dataType))
          .getOrElse(lit(0L)).as("__asof_tie"),
        struct(payloadCols.map(col): _*).as("__asof_r")) ++
        leftCarry.map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")): _*)

    val unioned = taggedLeft.unionByName(taggedRight)

    val order =
      if (forward) Seq(col("__asof_ts").asc, col("__asof_side").asc, col("__asof_tie").desc)
      else Seq(col("__asof_ts").asc, col("__asof_side").asc, col("__asof_tie").asc)
    val w0 = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val (w, pick) =
      if (forward)
        (w0.rowsBetween(Window.currentRow, Window.unboundedFollowing),
          (c: Column) => first(c, ignoreNulls = true))
      else
        (w0.rowsBetween(Window.unboundedPreceding, Window.currentRow),
          (c: Column) => last(c, ignoreNulls = true))

    val matchedRaw = unioned
      .withColumn("__asof_m", pick(col("__asof_r")).over(w))
      .filter(col("__asof_side") === leftSide)

    val matched = tolerance match {
      case Some(tol) =>
        val gap =
          if (forward) col("__asof_m").getField(rightTs) - col("__asof_ts")
          else col("__asof_ts") - col("__asof_m").getField(rightTs)
        matchedRaw.withColumn("__asof_m",
          when(col("__asof_m").isNotNull && gap <= tol, col("__asof_m")))
      case None => matchedRaw
    }

    val leftOut = left.columns.map { c =>
      if (keys.contains(c)) col(c)
      else if (c == leftTs) col("__asof_ts").as(c)
      else col(s"__l_$c").as(c)
    }
    val rightOut = rightCols.map(c => col("__asof_m").getField(c).as(prefix + c))
    matched.select(leftOut.toSeq ++ rightOut: _*)
  }
}
