package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKAggregateSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = {
    // ties on score, a null score, and groups smaller than k
    val rows = (1L to 500L).map(i => (s"g${i % 7}", (i % 23).toDouble, i)) ++
      Seq(("g0", Double.NaN, 9999L), ("tiny", 1.0, 10000L))
    rows.toDF("grp", "score", "id")
      .withColumn("score", when(col("id") === 9999L, lit(null)).otherwise(col("score")))
  }

  test("top-k aggregate equals the window formulation on ties and small groups") {
    val viaAgg = TopKAggregate.topKExploded(
        df.filter(col("score").isNotNull), Seq("grp"),
        col("score"), col("id"), k = 4)
      .select("grp", "score", "id", "rank")
      .as[(String, Double, Long, Long)].collect().toSet
    val w = Window.partitionBy("grp").orderBy(col("score").desc, col("id").asc)
    val viaWindow = df.filter(col("score").isNotNull)
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 4)
      .select(col("grp"), col("score"), col("id"), col("rank").cast("long"))
      .as[(String, Double, Long, Long)].collect().toSet
    assert(viaAgg == viaWindow)
  }

  test("ascending order and null-score rows are skipped") {
    val asc = TopKAggregate.topKExploded(df, Seq("grp"),
        col("score"), col("id"), k = 2, descending = false)
      .filter(col("grp") === "g0")
      .select("score", "id").as[(Double, Long)].collect().toSet
    // nulls never enter the buffer; smallest scores win, id tie-break
    val expect = df.filter(col("grp") === "g0" && col("score").isNotNull)
      .orderBy(col("score").asc, col("id").asc).limit(2)
      .select("score", "id").as[(Double, Long)].collect().toSet
    assert(asc == expect)
  }

  test("top_k is SQL-callable and matches the Column API") {
    GraftExtensions.register(spark)
    df.filter(col("score").isNotNull).createOrReplaceTempView("topk_in")
    val viaSql = spark.sql(
      "SELECT grp, top_k(score, id, 3) AS tk FROM topk_in GROUP BY grp")
      .select(col("grp"), col("tk").cast("string"))
      .as[(String, String)].collect().toMap
    val viaCol = df.filter(col("score").isNotNull).groupBy("grp")
      .agg(TopKAggregate.topK(col("score"), col("id"), 3).as("tk"))
      .select(col("grp"), col("tk").cast("string"))
      .as[(String, String)].collect().toMap
    assert(viaSql == viaCol)
  }

  test("plan aggregates with partial merge — no window, no full sort") {
    val agg = TopKAggregate.topKExploded(df, Seq("grp"), col("score"), col("id"), 3)
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window operator in plan:\n$plan")
    // ObjectHashAggregate appears for partial AND final = map-side combine
    val aggOps = "ObjectHashAggregate".r.findAllIn(plan).size
    assert(aggOps >= 2, s"expected partial+final aggregate stages:\n$plan")
  }
}
