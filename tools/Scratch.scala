package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary profiling harness — not part of the library surface
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.{TextFunctions => T, Sampling}
    val d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"),
        T.qualityScore(col("text")).as("quality"),
        T.tokenCount(col("text")).cast("long").as("n_tokens"))
    val sel = Sampling.budgetSelect(d, col("quality"), col("doc_id"),
      col("n_tokens"), budget = 10000L)
    sel.collect() // materialize THIS QueryExecution so AQE finalizes
    println("=== EXCHANGE SUBTREES (canonicalized) ===")
    val top = sel.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val stages = top.collect {
      case s: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec => s
    }
    stages.zipWithIndex.foreach { case (s, i) =>
      println(s"--- stage ${s.id} canonical hash=${s.plan.canonicalized.hashCode} ---")
      println(s.plan.canonicalized.toString.take(1200))
    }
    spark.stop()
  }
}
