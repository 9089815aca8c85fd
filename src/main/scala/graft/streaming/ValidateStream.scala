package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

import graft.rules.{RowRule, Rules}

/** Structured-Streaming front-end (SURVEY §2.10).
  *
  * The reference is strictly batch; its incremental behavior is the
  * md5-skip + PK-diff upsert. We expose the same validate→process
  * transforms over a streaming file source as an additive capability:
  * new files dropped into a center's input dir validate continuously,
  * and event-shaped sources get watermarked tumbling-window stats.
  */
object ValidateStream {

  /** Stream a directory of TSVs through the validation battery;
    * each micro-batch appends one findings row-set (one row per rule)
    * tagged with the batch id. foreachBatch keeps the battery's
    * single-pass aggregation shape.
    */
  def validationStream(spark: SparkSession, inputDir: String, schema: StructType,
                       rules: Seq[RowRule], checkpoint: String)
                      (sink: (DataFrame, Long) => Unit): DataStreamWriter[org.apache.spark.sql.Row] = {
    val src = spark.readStream
      .option("sep", "\t")
      .option("header", "true")
      .option("comment", "#")
      .schema(schema)
      .csv(inputDir)
    src.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(Rules.Battery.asDataFrame(batch, rules).withColumn("batch_id", lit(batchId)), batchId)
      }
  }

  /** Watermarked tumbling-window counts over an event stream — the
    * streaming twin of SparkEntry's `stream_tumbling_counts` batch
    * query (same output schema, exactly-once via checkpoint).
    */
  def tumblingCounts(events: DataFrame, tsCol: String, keyCol: String,
                     windowLen: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(unix_millis(col("window.start")).as("win_start_ms"),
        col(keyCol), col("n_events"), col("sum_value"))
}
