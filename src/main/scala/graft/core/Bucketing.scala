package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-shuffle once at write time so repeated
  * joins/aggregations on the bucket key run with NO exchange (the
  * co-located join the build spec calls for).
  *
  * At 100 TB the win is structural: a nightly upsert into a table
  * bucketed by SAMPLE_ID means every downstream keep-list semi-join,
  * per-sample window, and PK merge reads pre-partitioned data.
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (sorted within buckets so
    * sort-merge joins skip their sort too).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** True when the physical plan of `df` contains no shuffle exchange —
    * the observable guarantee bucketing buys.
    */
  def isExchangeFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange")
}
