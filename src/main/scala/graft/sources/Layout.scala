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

  /** Z-order (Morton) key over two non-negative integer columns, 16
    * bits each: bit i of x lands at position 2i, bit i of y at 2i+1.
    * Sorting/range-partitioning a table by this key clusters rows that
    * are close in BOTH dimensions into the same files, so parquet
    * min/max stats prune 2-D range predicates (x BETWEEN … AND y
    * BETWEEN …) that a single-column sort can only prune on one axis.
    * Pure bit arithmetic on longs — codegen'd per-row expression, no
    * shuffle; inputs are masked to 16 bits so the key is total and
    * stable regardless of out-of-range values.
    */
  def zorderKey2(x: org.apache.spark.sql.Column,
                 y: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val xm = x.cast("long").bitwiseAND(lit(0xFFFFL))
    val ym = y.cast("long").bitwiseAND(lit(0xFFFFL))
    (0 until 16).map { i =>
      shiftleft(shiftright(xm, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(ym, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Write `df` clustered by the Z-order of (xCol, yCol) into `nFiles`
    * range-partitioned, internally sorted parquet files. Each file then
    * covers a compact Z-range = a compact 2-D tile, so a reader's 2-D
    * range predicate touches only the intersecting tiles (file- and
    * row-group-level min/max skipping on BOTH columns).
    */
  def writeZOrdered(df: DataFrame, path: String, xCol: String,
                    yCol: String, nFiles: Int): Unit =
    df.withColumn("__z", zorderKey2(col(xCol), col(yCol)))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Write with parquet BLOOM FILTERS on the named columns: point
    * (equality) predicates on a high-cardinality column scattered
    * through the table — the case min/max stats cannot prune because
    * every row group spans the full value range — skip row groups via
    * the bloom instead. This is a pure write-side option (parquet-mr
    * builds the filters); readers get the skipping for free through
    * Spark's pushed equality filters. ~1 byte/value of extra file
    * footprint at the default FPP.
    */
  def writeWithBloom(df: DataFrame, path: String, bloomCols: Seq[String],
                     expectedDistinct: Long = 100000L): Unit = {
    val w = bloomCols.foldLeft(df.write.mode("overwrite")) { (wr, c) =>
      wr.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", expectedDistinct.toString)
    }
    w.parquet(path)
  }

  /** OPTIMIZE-style table maintenance: rewrite an existing parquet
    * directory Z-order-clustered on (xCol, yCol), sized to
    * ceil(bytes / targetBytes) files — compaction and 2-D clustering in
    * one pass (a table accreting small unsorted files from streaming
    * upserts gets both fixed together). Same temp-write + swap
    * discipline as [[compact]]: readers never observe a half-rewritten
    * directory on a filesystem with atomic rename. Returns the output
    * file count.
    */
  def optimizeZOrdered(spark: SparkSession, path: String, xCol: String,
                       yCol: String,
                       targetBytes: Long = 128L * 1024 * 1024): Int = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    val totalBytes = fs.listStatus(hPath)
      .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
      .map(_.getLen).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val tmp = new org.apache.hadoop.fs.Path(path + "__zopt_tmp")
    writeZOrdered(spark.read.parquet(path), tmp.toString, xCol, yCol, nFiles)
    swapDirs(fs, hPath, tmp, new org.apache.hadoop.fs.Path(path + "__zopt_old"),
      "z-order optimize")
    nFiles
  }

  /** Two-rename directory swap: path → bak, tmp → path, delete bak.
    * Even on a filesystem with atomic rename there is a window between
    * the two renames where `path` does not exist — concurrent readers
    * must tolerate a transient missing directory (or the table must be
    * fronted by a catalog pointer, which is how Delta/Iceberg avoid
    * this). If the second rename fails, the original directory is
    * renamed back so the table is never left stranded in `bak`.
    */
  private[graft] def swapDirs(fs: org.apache.hadoop.fs.FileSystem,
                       path: org.apache.hadoop.fs.Path,
                       tmp: org.apache.hadoop.fs.Path,
                       bak: org.apache.hadoop.fs.Path, what: String): Unit = {
    if (fs.exists(bak)) fs.delete(bak, true)
    if (!fs.rename(path, bak))
      throw new IllegalStateException(s"$what swap failed for $path (rename to $bak)")
    // some FileSystem impls return false on a failed rename, others
    // throw — rollback must cover both
    val second = scala.util.Try(fs.rename(tmp, path))
    if (!second.getOrElse(false)) {
      val rolledBack = scala.util.Try(fs.rename(bak, path)).getOrElse(false)
      val ex = new IllegalStateException(
        s"$what swap failed for $path (rename from $tmp); " +
          (if (rolledBack) s"original restored from $bak"
           else s"ROLLBACK ALSO FAILED — data stranded in $bak"))
      second.failed.foreach(ex.addSuppressed)
      throw ex
    }
    fs.delete(bak, true)
  }

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
    swapDirs(fs, hPath, tmp, new org.apache.hadoop.fs.Path(path + "__compact_old"),
      "compaction")
    nFiles
  }
}
