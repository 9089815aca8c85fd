package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Post-execution plan metrics: read them AFTER an action so the SQL
  * metric accumulators are populated. Shuffle volume is the number that
  * predicts 100 TB behavior — a query that is fast at sf0.1 but
  * shuffles its whole input is a scale bug the wall clock hides.
  */
object PlanMetrics {

  /** Execute `df`'s OWN plan and return its row count. `df.count()`
    * builds a separate derived plan (whose execution leaves this one's
    * metric accumulators untouched — and lets Catalyst skip column
    * materialization entirely); `toRdd.count()` runs the exact plan the
    * metrics hang off.
    */
  def runAndCount(df: DataFrame): Long = df.queryExecution.toRdd.count()

  /** The final (AQE-resolved) physical plan. */
  def finalPlan(df: DataFrame): SparkPlan = df.queryExecution.executedPlan match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case p => p
  }

  private def collectAll(plan: SparkPlan): Seq[SparkPlan] = {
    // AQE nests finished stages behind QueryStageExec leaves; collect
    // recurses through them via the stage's own plan
    plan.collect {
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        collectAll(s.plan)
      case p => Seq(p)
    }.flatten
  }

  /** Sum of a named SQL metric across every node of the final plan. */
  def metricSum(df: DataFrame, metricName: String): Long =
    collectAll(finalPlan(df))
      .flatMap(_.metrics.get(metricName).map(_.value))
      .sum

  /** Bytes written to shuffle during the last execution of `df`. */
  def shuffleBytesWritten(df: DataFrame): Long =
    metricSum(df, "shuffleBytesWritten")

  /** Rows produced by the scan operators (column-pruned source reads). */
  def scanOutputRows(df: DataFrame): Long =
    collectAll(finalPlan(df))
      .filter(_.nodeName.toLowerCase.contains("scan"))
      .flatMap(_.metrics.get("numOutputRows").map(_.value))
      .sum
}
