package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session + table helpers shared by every entry point.
  *
  * Scale notes: shuffle partitions default to the local core count here,
  * but on a real cluster the caller sets `spark.sql.shuffle.partitions`
  * (or relies on AQE coalescing, which we enable). All engine code is
  * written against whatever partitioning the session provides — no
  * hard-coded parallelism anywhere else in the library.
  */
object GraftSession {

  def builder(master: String = "local[*]", cpus: Int = Runtime.getRuntime.availableProcessors()): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // runtime filtering: a selective build side injects a bloom filter
      // (or semi-join keys) into the probe side's scan, cutting shuffle
      // volume for the big joins (release filters, LSH pair joins) at
      // 100 TB. Thresholds stay at Spark defaults; the spec asserts the
      // injection fires on a selective join.
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // skew: let AQE split oversized partitions for the skewed joins
      // the salting utilities don't already cover
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // harness `events` table carries parquet TIMESTAMP(NANOS) which
      // Spark cannot model; read as long nanoseconds instead
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // managed tables (bucketed staging) land in tmp, never the cwd —
      // a library must not scatter spark-warehouse/ dirs into user repos
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft_warehouse")
      .config("spark.ui.enabled", "false")

  def local(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Read one of the harness parquet tables from a scale-factor dir. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
