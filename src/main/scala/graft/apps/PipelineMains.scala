package graft.apps

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.GraftSession

/** CLI mains for the two batch entry points beyond validation —
  * parity with the reference's bin/ scripts (§3.2 input_to_database,
  * §3.3 database_to_staging/consortium_to_public). The logic lives in
  * [[ProcessJob]] / [[ReleaseJob]] (spec-covered); these wrappers add
  * the file-backed state a standalone run needs.
  */
object ProcessMain {

  /** State layout under `stateDir`: `file_status.parquet` (name, md5,
    * status) drives the P29 md5-skip across runs; `tables/<name>` holds
    * the current table contents the upsert merges into.
    */
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ProcessMain <center> <inputDir> <stateDir>")
    val Array(center, inputDir, stateDir) = args
    // stop only a session this main created (specs drive main() inside
    // a shared-session JVM)
    val preExisting = SparkSession.getDefaultSession.isDefined
    val spark = GraftSession.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val statusPath = s"$stateDir/file_status.parquet"
    val prior: Seq[ProcessJob.FileStatus] =
      if (new java.io.File(statusPath).exists()) {
        import spark.implicits._
        spark.read.parquet(statusPath).as[ProcessJob.FileStatus].collect().toSeq
      } else Seq.empty
    val tablesDir = new java.io.File(s"$stateDir/tables")
    val existing: Map[String, DataFrame] =
      if (!tablesDir.exists()) Map.empty
      else tablesDir.listFiles().filter(_.isDirectory).map { d =>
        d.getName -> spark.read.parquet(d.getPath)
      }.toMap

    val result = ProcessJob.run(spark, center, inputDir, prior, existing)

    // persist merged tables THEN statuses — a crash mid-write re-runs
    // the affected files next time (md5 status not yet recorded)
    val conf = spark.sessionState.newHadoopConf()
    result.tables.foreach { case (name, df) =>
      val tmp = new org.apache.hadoop.fs.Path(s"$stateDir/tables/__tmp_$name")
      val dst = new org.apache.hadoop.fs.Path(s"$stateDir/tables/$name")
      val fs = dst.getFileSystem(conf)
      df.write.mode("overwrite").parquet(tmp.toString)
      if (fs.exists(dst)) fs.delete(dst, true)
      if (!fs.rename(tmp, dst))
        throw new IllegalStateException(s"table swap failed for $name")
    }
    import spark.implicits._
    result.statuses.toDF().write.mode("overwrite").parquet(statusPath)

    result.statuses.foreach(s => println(s"STATUS ${s.name}: ${s.status}"))
    result.skipped.foreach(n => println(s"SKIPPED $n (unchanged md5)"))
    result.errors.foreach { case (n, errs) =>
      errs.foreach(e => println(s"ERROR $n: $e"))
    }
    if (!preExisting) spark.stop()
  }
}

object ReleaseMain {

  /** Reads the processed tables from `tableDir` (parquet dirs named
    * clinical_sample, clinical_patient, maf, cna_long, seg, sv, bed,
    * assay) and writes the full versioned release folder. Pass "public"
    * as the 5th arg for the consortium→public variant.
    */
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: ReleaseMain <tableDir> <outDir> <studyId> <genieVersion> [public]")
    val tableDir = args(0)
    val preExisting = SparkSession.getDefaultSession.isDefined
    val spark = GraftSession.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String): DataFrame = spark.read.parquet(s"$tableDir/$name")
    val manifest = ReleaseJob.writeFullRelease(
      ReleaseJob.FullReleaseInputs(
        clinicalSample = t("clinical_sample"), clinicalPatient = t("clinical_patient"),
        maf = t("maf"), cnaLong = t("cna_long"), seg = t("seg"), sv = t("sv"),
        bed = t("bed"), assayInfo = t("assay")),
      baseDir = args(1), studyId = args(2), genieVersion = args(3),
      public = args.lift(4).contains("public"))
    manifest.foreach(p => println(s"ARTIFACT $p"))
    if (!preExisting) spark.stop()
  }
}
