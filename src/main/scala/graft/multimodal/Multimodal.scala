package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing for training-data pipelines.
  *
  * Contract: image/audio/video payloads are opaque `binary` columns with
  * a typed metadata struct alongside. The Spark-side machinery — schema,
  * partition sizing, batch iteration via mapPartitions, deterministic
  * output shape — is real and tested; the actual codec calls are STUBBED
  * (this container ships no image/audio libraries) behind
  * [[StubCodec]], clearly marked, with a deterministic fake so tests
  * and downstream operators have stable inputs.
  *
  * Scale notes: payloads never shuffle unless the caller asks for it;
  * decode/feature steps are mapPartitions (no per-row task overhead,
  * amortized codec init per partition — the same shape Python pipelines
  * get from mapInPandas). Target partition sizing for 100 TB of blobs is
  * controlled by `spark.sql.files.maxPartitionBytes` at read time.
  */
object Multimodal {

  /** Typed metadata rows produced by decode. */
  final case class MediaMeta(id: Long, n_bytes: Int, width: Int, height: Int,
                             n_frames: Int, format: String)

  final case class MediaFeature(id: Long, dim: Int, feature: Array[Float])

  /** STUB codec — deterministic fake decode. A real deployment swaps
    * this for JNI/FFI codec calls; the signature and batch shape stay.
    */
  object StubCodec {
    /** ??? real impl: decode header via imageio/ffprobe. Deterministic
      * fake: derive dims from byte length and first byte.
      */
    def decodeMeta(id: Long, payload: Array[Byte]): MediaMeta = {
      val n = payload.length
      val b0 = if (n > 0) payload(0) & 0xff else 0
      MediaMeta(id, n, width = n % 64 + 1, height = b0 % 64 + 1,
        n_frames = n % 7 + 1, format = if (n % 2 == 0) "img" else "vid")
    }

    /** ??? real impl: resize + embed. Deterministic fake: k-dim rolling
      * byte histogram, L1-normalized.
      */
    def extractFeature(id: Long, payload: Array[Byte], dim: Int): MediaFeature = {
      val hist = new Array[Float](dim)
      var i = 0
      while (i < payload.length) { hist((payload(i) & 0xff) % dim) += 1f; i += 1 }
      val total = math.max(1f, payload.length.toFloat)
      var j = 0
      while (j < dim) { hist(j) /= total; j += 1 }
      MediaFeature(id, dim, hist)
    }
  }

  /** Attach a binary payload column name pair → typed metadata Dataset.
    * mapPartitions so a real codec initializes once per partition.
    */
  def decodeMeta(df: DataFrame, idCol: String, payloadCol: String): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real impl: init codec here, once per partition
        it.map { case (id, payload) => StubCodec.decodeMeta(id, Option(payload).getOrElse(Array.empty)) }
      }
  }

  /** Feature extraction with fixed output dim — the batch shape a
    * downstream ANN index consumes.
    */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String,
                      dim: Int): Dataset[MediaFeature] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          StubCodec.extractFeature(id, Option(payload).getOrElse(Array.empty), dim)
        }
      }
  }

  /** Frame sampling plan: every `stride`-th frame index per item —
    * pure column math (no decode), the partition-friendly precursor
    * to a real frame extractor.
    */
  def frameSamplePlan(meta: Dataset[MediaMeta], stride: Int): DataFrame =
    meta.toDF()
      .withColumn("frame_idx", explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
      .select("id", "frame_idx")
}
