package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical data layout for scale: hive-partitioned + sorted parquet.
  *
  * At 100 TB the fastest scan is the one that never happens: writing a
  * table partitioned by its hottest low-cardinality predicate column
  * (center, event_type, lang, release) turns `WHERE center = 'X'` into
  * directory-level partition pruning (the scan's `PartitionFilters`),
  * and sorting within partitions by the hottest range column (ts,
  * position) tightens parquet row-group min/max stats so range
  * predicates skip pages (`PushedFilters`). Both effects are free at
  * read time — they are pure write-side layout decisions.
  */
object Layout {

  /** Write `df` hive-partitioned by `partitionCols`, with files inside
    * each partition sorted by `sortCols`.
    *
    * The repartition-on-partition-columns before `partitionBy` matters:
    * without it every task holds a writer per partition value (small
    * files, memory pressure); with it each task writes few partitions,
    * producing one-ish file per partition value. Skewed partition
    * values can be subdivided by passing `filesPerPartition` > 1.
    */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String], sortCols: Seq[String],
                       filesPerPartition: Int = 1): Unit = {
    val shuffleKeys =
      if (filesPerPartition <= 1) partitionCols.map(col)
      else partitionCols.map(col) :+ pmod(hash(col(sortCols.head)), lit(filesPerPartition))
    df.repartition(shuffleKeys: _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write.partitionBy(partitionCols: _*)
      .mode("overwrite").parquet(path)
  }

  /** Read back a layout written by [[writePartitioned]]. Plain
    * `spark.read.parquet` — partition pruning and filter pushdown are
    * applied by the planner from the predicates alone.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
