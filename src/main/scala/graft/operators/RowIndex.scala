package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
  */
object RowIndex {

  /** Parquet-backed: exact (file, row) position → global index by file
    * path order. One window over file-path (small cardinality) — the
    * per-file index comes free from the reader.
    */
  def forParquet(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(path)
      .select(col("*"), col("_metadata.file_path").as("__file"),
        col("_metadata.row_index").as("__pos"))
    val files = df.select("__file").distinct().orderBy("__file")
      .collect().map(_.getString(0)).zipWithIndex.toMap
    val fileRank = udfLessFileRank(files)
    df.withColumn("__file_rank", fileRank(col("__file")))
      .withColumn("row_id",
        row_number().over(Window.orderBy(col("__file_rank"), col("__pos"))).cast("long") - 1)
      .drop("__file", "__pos", "__file_rank")
  }

  private def udfLessFileRank(files: Map[String, Int]): org.apache.spark.sql.Column => org.apache.spark.sql.Column = {
    // small map → when-chain, stays codegen'd (no UDF)
    (c: org.apache.spark.sql.Column) =>
      files.toSeq.sortBy(_._2).foldLeft(lit(-1)) { case (acc, (f, r)) =>
        when(c === f, lit(r)).otherwise(acc)
      }
  }

  /** Generic: deterministic index from a caller-supplied total order. */
  def byOrder(df: DataFrame, orderCols: Seq[String]): DataFrame =
    df.withColumn("row_id",
      row_number().over(Window.orderBy(orderCols.map(col): _*)).cast("long") - 1)
}
