package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec

/** Plan lint over EVERY SparkEntry query: the scale anti-patterns that
  * pass a toy-data correctness gate but die at 100 TB must not appear
  * in any plan — a regression net for "it worked, but the plan rotted".
  *
  *  - WindowExec with an empty partition spec funnels the whole input
  *    through ONE task (the "No Partition Defined" warning). The only
  *    allowed instance count is ZERO since round 10: budgetSelect's
  *    bin-level prefix sum (the one documented exemption) now runs as
  *    a driver scan-left + broadcast literal table.
  *  - CartesianProductExec is the non-broadcast cross join — O(n·m)
  *    with a shuffle of both sides. (BroadcastNestedLoopJoin with a
  *    small side is fine and intended for e.g. hard-negative mining.)
  */
class PlanLintSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val self = p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case other => Seq(other)
    }
    self ++ p.children.flatMap(allNodes) ++
      p.subqueries.flatMap(allNodes)
  }

  /** Exact expected count of empty-partition WindowExec nodes per
    * query — not a boolean whitelist: the allowed query must plan
    * EXACTLY its documented window (a second one, or the window
    * vanishing while the whitelist still vouches for it, both fail),
    * and every other query must plan zero. This pins the bench log's
    * "No Partition Defined" warning volume to a known source — a new
    * offender can't hide in the noise.
    */
  private val globalWindowExpected = Map.empty[String, Int]

  test("no query plans a single-partition window or a cartesian product") {
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan
        val nodes = allNodes(plan)
        val globalWindows = nodes.count {
          case w: WindowExec => w.partitionSpec.isEmpty
          case _ => false
        }
        val expected = globalWindowExpected.getOrElse(name, 0)
        if (globalWindows != expected)
          failures += s"$name: $globalWindows empty-partitionSpec WindowExec node(s), expected $expected"
        val cartesians = nodes.collect { case c: CartesianProductExec => c }
        if (cartesians.nonEmpty)
          failures += s"$name: CartesianProductExec (non-broadcast cross join)"
      } catch {
        case e: Throwable => failures += s"$name: plan construction failed: ${e.getMessage}"
      }
    }
    assert(failures.isEmpty, "plan lint violations:\n" + failures.mkString("\n"))
  }
}
