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

  /** Small-file compaction: rewrite a parquet directory into
    * ceil(bytes / targetBytes) files. Streaming upserts and per-batch
    * writes accrete small files; at 100 TB a scan of 10^6 small files
    * is dominated by open/footer costs, not bytes. Returns the output
    * file count. Write-to-temp + swap so a concurrent reader never sees
    * a half-compacted directory on a filesystem with atomic rename.
    */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024): Int = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    val totalBytes = fs.listStatus(hPath)
      .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
      .map(_.getLen).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val tmp = new org.apache.hadoop.fs.Path(path + "__compact_tmp")
    spark.read.parquet(path).repartition(nFiles)
      .write.mode("overwrite").parquet(tmp.toString)
    val bak = new org.apache.hadoop.fs.Path(path + "__compact_old")
    if (fs.exists(bak)) fs.delete(bak, true)
    if (!fs.rename(hPath, bak) || !fs.rename(tmp, hPath))
      throw new IllegalStateException(s"compaction swap failed for $path")
    fs.delete(bak, true)
    nFiles
  }
}
