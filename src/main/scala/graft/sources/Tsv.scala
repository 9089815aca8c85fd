package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructType, StringType, DoubleType, FloatType}

/** Generic flat-file table IO (SURVEY §2.1 S1, S11).
  *
  * Reference semantics reproduced:
  *  - S1 read: TSV, `#` comment lines skipped, header row
  *    (example_filetype_format.py:83-97);
  *  - column names upper-cased on ingest (clinical.py:819, maf.py:240);
  *  - S11 write: integral floats serialized without a trailing `.0`
  *    (process_functions.py:258-303) and nulls written as a
  *    configurable NA token (cna.py:166-172).
  *
  * Scale: both directions are plain distributed text scans/writes —
  * schema is pinned (never inferred; the reference's dtype sniffing was
  * a pandas artifact, SURVEY §1.2) so the read is a single pass.
  */
object Tsv {

  /** S1: read a TSV with a fixed schema, skipping `#` comments. */
  def read(spark: SparkSession, path: String, schema: StructType,
           sep: String = "\t", header: Boolean = true): DataFrame =
    spark.read
      .option("sep", sep)
      .option("header", header.toString)
      .option("comment", "#")
      .option("nullValue", "")
      .schema(schema)
      .csv(path)

  /** S1 variant with inferred-as-string schema + upper-cased columns
    * (what the reference does to every clinical file).
    */
  def readAllString(spark: SparkSession, path: String, sep: String = "\t"): DataFrame = {
    val df = spark.read
      .option("sep", sep)
      .option("header", "true")
      .option("comment", "#")
      .option("nullValue", "")
      .csv(path)
    df.toDF(df.columns.toIndexedSeq.map(_.toUpperCase): _*)
  }

  /** S11: write a TSV without pandas float artifacts: integral
    * double/float columns are cast to long-string (no `.0`), nulls
    * become `naToken`. One distributed write, no driver collect.
    */
  def write(df: DataFrame, path: String, naToken: String = "",
            sep: String = "\t"): Unit = {
    val cleaned = df.select(df.schema.fields.toIndexedSeq.map { f =>
      val c = col(s"`${f.name}`") // backtick-quoted — survives dotted names (LOC.START)
      f.dataType match {
        case DoubleType | FloatType =>
          // "12.0" → "12"; NaN/Infinity/huge values fall through to the
          // plain string form (decimal cast would null or throw on them)
          when(c.isNull, lit(naToken))
            .when(!isnan(c) && abs(c) <= 1e15 && c === floor(c),
              c.cast("decimal(30,0)").cast("string"))
            .otherwise(c.cast("string")).as(f.name)
        case StringType => coalesce(c, lit(naToken)).as(f.name)
        case _          => coalesce(c.cast("string"), lit(naToken)).as(f.name)
      }
    }: _*)
    cleaned.write
      .option("sep", sep)
      .option("header", "true")
      .option("emptyValue", "")
      .option("nullValue", naToken)
      .mode("overwrite")
      .csv(path)
  }

  /** Publish a DataFrame as ONE named flat file — the cBioPortal
    * release-artifact shape (data_mutations_extended.txt etc.,
    * database_to_staging.py:1011-1062 writes single files via pandas).
    * The pipeline computes distributed; this coalesce(1)+rename is only
    * the final publish step for a named artifact, never a compute path.
    */
  def writeSingle(df: DataFrame, outFile: String, naToken: String = "",
                  sep: String = "\t"): Unit = {
    val tmp = outFile + "_tmpdir"
    write(df.coalesce(1), tmp, naToken, sep)
    // Hadoop FileSystem API, not java.io: the output path may be a
    // non-local URI (HDFS/S3) where driver-local file listing would fail.
    val conf = df.sparkSession.sessionState.newHadoopConf()
    val tmpPath = new org.apache.hadoop.fs.Path(tmp)
    val fs = tmpPath.getFileSystem(conf)
    val part = fs.listStatus(tmpPath).map(_.getPath)
      .find(_.getName.startsWith("part-"))
      .getOrElse(throw new IllegalStateException(s"no part file under $tmp"))
    val target = new org.apache.hadoop.fs.Path(outFile)
    Option(target.getParent).foreach(fs.mkdirs)
    if (fs.exists(target)) fs.delete(target, false)
    if (!fs.rename(part, target))
      throw new IllegalStateException(s"rename $part -> $target failed")
    // local ChecksumFileSystem renames the .crc sidecar alongside the
    // part file — not a release artifact; no-op on filesystems without one
    val crc = new org.apache.hadoop.fs.Path(
      target.getParent, "." + target.getName + ".crc")
    if (fs.exists(crc)) fs.delete(crc, false)
    fs.delete(tmpPath, true)
  }
}
