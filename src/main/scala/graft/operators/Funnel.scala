package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event stream: of the users who did
  * step 1 (e.g. `view`), how many went on to step 2 (`click`), then
  * step 3, … in strict timestamp order — the conversion shape behind
  * the reference's dashboard-style cohort counts and the standard
  * event-analytics primitive (ClickHouse `windowFunnel`, Amplitude
  * funnels) this engine would otherwise lack.
  *
  * Physical shape — ONE shuffle, on the user key: events are filtered
  * to the step types map-side (scan-level pushdown), collected per user
  * as (ts, type) pairs, sorted, and folded by a codegen'd `aggregate`
  * HOF whose accumulator is one timestamp slot per step; the first
  * event matching the next unfilled slot with a strictly later
  * timestamp fills it. Because the fold runs in ascending time order,
  * the filled slots equal the chained-min formulation
  * (`t_i = min ts of step-i events with ts > t_{i-1}`), which is what
  * the DuckDB oracle replays as k joined CTEs. Per-user state is the
  * user's step-type events only — bounded by individual activity, never
  * by table size (the k-chained-join alternative shuffles the events
  * table k times; this shuffles it once).
  *
  * `windowMs`: optional completion window — steps 2..k must land within
  * `windowMs` of the slot-1 timestamp (first-touch anchoring: the
  * earliest step-1 event is the anchor, later step-1 events never
  * re-anchor).
  */
object Funnel {

  /** Per-user step-completion timestamps: `userCol`, `slots`
    * (array of k epoch-millis, null = step not reached).
    */
  def userSlots(events: DataFrame, userCol: String, tsCol: String,
                typeCol: String, steps: Seq[String],
                windowMs: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val k = steps.length
    val init = array(steps.map(_ => lit(null).cast("long")): _*)
    def merge(acc: Column, e: Column): Column = {
      def filled(i: Int): Column =
        array((0 until k).map(j =>
          if (j == i) e.getField("ts") else element_at(acc, j + 1)): _*)
      val branches = (0 until k).map { i =>
        val inOrder =
          if (i == 0) lit(true)
          else e.getField("ts") > element_at(acc, i)
        val inWindow = windowMs match {
          case Some(w) if i > 0 => e.getField("ts") <= element_at(acc, 1) + lit(w)
          case _ => lit(true)
        }
        val fill = e.getField("et") === lit(steps(i)) && inOrder && inWindow
        (element_at(acc, i + 1).isNull, when(fill, filled(i)).otherwise(acc))
      }
      branches.foldRight(acc) { case ((cond, out), rest) =>
        when(cond, out).otherwise(rest)
      }
    }
    events
      .filter(col(typeCol).isin(steps: _*))
      .select(col(userCol), col(tsCol).cast("long").as("ts"), col(typeCol).as("et"))
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(struct(col("ts"), col("et")))).as("__evs"))
      .select(col(userCol),
        aggregate(col("__evs"), init, merge).as("slots"))
  }

  /** Funnel counts: one row per step — `step` (1-based), `event_type`,
    * `n_users` who completed steps 1..step in order. Monotonically
    * non-increasing down the funnel by construction.
    */
  def conversion(events: DataFrame, userCol: String, tsCol: String,
                 typeCol: String, steps: Seq[String],
                 windowMs: Option[Long] = None): DataFrame = {
    val labels = array(steps.map(lit): _*)
    userSlots(events, userCol, tsCol, typeCol, steps, windowMs)
      .select(posexplode(col("slots")).as(Seq("pos", "t")))
      .groupBy(col("pos"))
      .agg(count(col("t")).as("n_users")) // count ignores null slots
      .select((col("pos") + 1).cast("long").as("step"),
        element_at(labels, col("pos") + 1).as("event_type"),
        col("n_users"))
  }
}
