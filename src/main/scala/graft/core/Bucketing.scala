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
    writeBucketed(df, table, Seq(key), Seq(key), buckets)

  /** Bucket on a multi-column key (e.g. a composite PK), sorted within
    * buckets on `sortCols`. The bucket column list must equal the join
    * keys of the downstream join EXACTLY — Spark's co-partition check
    * (`spark.sql.requireAllClusterKeysForCoPartition`, default true)
    * rejects subset-key matches, so bucketing on a PK prefix would
    * still shuffle both sides. With the full tuple, a scan reports
    * `HashPartitioning(keys, buckets)`, the join's distribution is
    * satisfied, and only the other (delta-sized) side exchanges; the
    * within-bucket sort lets the sort-merge join skip this side's sort.
    */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    sortCols: Seq[String], buckets: Int): Unit =
    df.write
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(sortCols.head, sortCols.tail: _*)
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
