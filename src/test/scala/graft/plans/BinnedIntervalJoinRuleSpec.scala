package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BinnedIntervalJoinRuleSpec extends SparkSpec {
  import spark.implicits._

  private def points = (1 to 300).map(i => ("1", i.toLong * 7 % 500, i.toLong * 7 % 500))
    .toDF("chrom", "s", "e")
  private def intervals = (1 to 40).map(i => ("1", i.toLong * 13 % 400, i.toLong * 13 % 400 + 25))
    .toDF("chrom", "rs", "re")

  private def overlapJoin = points.as("p").join(intervals.as("r"),
    col("p.chrom") === col("r.chrom") &&
      RangeOverlap(col("p.s"), col("p.e"), col("r.rs"), col("r.re")))

  test("range_overlap marker evaluates correctly without the rule") {
    val viaMarker = overlapJoin.count()
    val viaPlain = points.as("p").join(intervals.as("r"),
      col("p.chrom") === col("r.chrom") &&
        col("p.s") <= col("r.re") && col("p.e") >= col("r.rs")).count()
    assert(viaMarker == viaPlain && viaMarker > 0)
  }

  test("optimizer rule rewrites large-large overlap joins to the binned shape") {
    val em = spark.sessionState.experimentalMethods
    val prev = em.extraOptimizations
    em.extraOptimizations = prev :+ BinnedIntervalJoinRule(binSize = 32, broadcastThreshold = 0)
    try {
      val joined = overlapJoin
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("explode"), optimized.take(2000))
      assert(optimized.contains("__bin_l"), optimized.take(2000))

      // and the rewrite preserves results exactly
      val viaRule = joined.select("s", "rs").as[(Long, Long)].collect().sorted.toSeq
      em.extraOptimizations = prev
      val plain = overlapJoin.select("s", "rs").as[(Long, Long)].collect().sorted.toSeq
      assert(viaRule == plain)
    } finally em.extraOptimizations = prev
  }

  test("rule leaves broadcast-size joins alone (fallback path)") {
    val em = spark.sessionState.experimentalMethods
    val prev = em.extraOptimizations
    // default 8MB threshold: tiny local relations stay un-rewritten
    em.extraOptimizations = prev :+ BinnedIntervalJoinRule()
    try {
      val optimized = overlapJoin.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("__bin_l"))
    } finally em.extraOptimizations = prev
  }

  test("rule does NOT fire when the marker sits under OR (soundness)") {
    val em = spark.sessionState.experimentalMethods
    val prev = em.extraOptimizations
    em.extraOptimizations = prev :+ BinnedIntervalJoinRule(binSize = 32, broadcastThreshold = 0)
    try {
      val disjunctive = points.as("p").join(intervals.as("r"),
        col("p.chrom") =!= col("r.chrom") ||
          RangeOverlap(col("p.s"), col("p.e"), col("r.rs"), col("r.re")))
      assert(!disjunctive.queryExecution.optimizedPlan.toString.contains("__bin_l"))
      // and results match the plain-predicate form exactly
      val viaMarker = disjunctive.count()
      em.extraOptimizations = prev
      val plain = points.as("p").join(intervals.as("r"),
        col("p.chrom") =!= col("r.chrom") ||
          (col("p.s") <= col("r.re") && col("p.e") >= col("r.rs"))).count()
      assert(viaMarker == plain)
    } finally em.extraOptimizations = prev
  }

  test("SQL surface: range_overlap registered via extensions") {
    GraftExtensions.register(spark)
    points.createOrReplaceTempView("ro_points")
    intervals.createOrReplaceTempView("ro_intervals")
    val n = spark.sql(
      """SELECT count(*) FROM ro_points p JOIN ro_intervals r
         ON p.chrom = r.chrom AND range_overlap(p.s, p.e, r.rs, r.re)""")
      .collect()(0).getLong(0)
    assert(n > 0)
  }
}
