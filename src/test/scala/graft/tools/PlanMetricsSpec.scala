package graft.tools

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PlanMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("shuffle bytes: positive for a groupBy, zero for a scan-only plan") {
    val dir = tmpDir("pm") + "/t"
    (1L to 10000L).map(i => (i, s"g${i % 5}", i * 2.0)).toDF("id", "g", "v")
      .write.parquet(dir)

    val scanOnly = spark.read.parquet(dir).filter(col("id") < 100)
    PlanMetrics.runAndCount(scanOnly)
    assert(PlanMetrics.shuffleBytesWritten(scanOnly) == 0L)

    val agg = spark.read.parquet(dir).groupBy("g")
      .agg(sum(col("v").cast("decimal(30,2)")).as("s"))
    assert(PlanMetrics.runAndCount(agg) == 5L)
    assert(PlanMetrics.shuffleBytesWritten(agg) > 0L)
    // map-side combine: the shuffle carries ~5 groups per task, far
    // below the 10k input rows
    assert(PlanMetrics.shuffleBytesWritten(agg) < 100 * 1024)
  }

  test("scan rows reflect pushed-down filters") {
    val dir = tmpDir("pm2") + "/t"
    (1L to 1000L).map(i => (i, i % 7)).toDF("id", "k").write.parquet(dir)
    val filtered = spark.read.parquet(dir).filter(col("id") <= 10)
    PlanMetrics.runAndCount(filtered)
    // row-group stats may admit a whole group, but never the full table
    val rows = PlanMetrics.scanOutputRows(filtered)
    assert(rows >= 10 && rows < 1000, s"scan read $rows rows")
  }
}
