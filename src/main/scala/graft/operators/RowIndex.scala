package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic row indices for error messages (SURVEY §4 custom item
  * 3 / §2.2 P3; reference process_functions.py:1078-1083 reports pandas
  * row indices).
  *
  * `monotonically_increasing_id` is partition-layout dependent — fine
  * for uniqueness, wrong for stable error messages. For file-backed
  * data we derive the index from what IS stable: the source file path
  * and the in-file position.
  *
  *  - parquet: `_metadata.row_index` (exact per-file position) ordered
  *    by file path;
  *  - csv/text: per-file `row_number` over a total ordering the caller
  *    supplies (file order is only byte order — callers that need exact
  *    byte order should read via `spark.read.text` which preserves
  *    line offsets in `_metadata` too).
  *
  * Neither path uses a global (unpartitioned) window: a global
  * `row_number()` moves every row to one partition, which is a
  * single-executor bottleneck at scale. Both are two-phase instead —
  * a driver-small per-unit count, then an offset + local position.
  */
object RowIndex {

  /** Parquet-backed: exact (file, row) position → global index by file
    * path order. Phase 1 is a per-file count (rows = #files,
    * driver-small); phase 2 adds the broadcast file offset to the
    * reader-provided in-file position. No sort, no window, no data
    * shuffle — each partition writes its indices independently.
    */
  def forParquet(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(path)
      .select(col("*"), col("_metadata.file_path").as("__file"),
        col("_metadata.row_index").as("__pos"))
    val counts = df.groupBy("__file").count()
      .orderBy("__file").collect()
    var off = 0L
    val offsets = counts.map { r =>
      val pair = (r.getString(0), off); off += r.getLong(1); pair
    }.toSeq
    val offsetsDf = spark.createDataFrame(offsets).toDF("__file", "__off")
    df.join(broadcast(offsetsDf), Seq("__file"))
      .withColumn("row_id", col("__off") + col("__pos"))
      .drop("__file", "__pos", "__off")
  }

  /** Generic: deterministic index from a caller-supplied total order.
    * Sort (range exchange) → per-partition offsets via zipWithIndex —
    * the count job and the index job share the sort's shuffle output,
    * so the data is ranged once and never funneled to one partition.
    */
  def byOrder(df: DataFrame, orderCols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.sort(orderCols.map(col): _*)
    val schema = sorted.schema.add("row_id", LongType, nullable = false)
    val indexed = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(indexed, schema)
  }
}
