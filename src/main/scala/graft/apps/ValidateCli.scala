package graft.apps

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

import graft.core.GraftSession
import graft.formats.{ClinicalFormat, MafFormat}
import graft.sources.{Bed, Maf, Tsv, Vcf}

/** `validate <center> <inputDir>` — the engine's analog of the
  * reference's `genie validate` CLI (SURVEY §3.1; validate.py:221-260).
  *
  * File types resolve by filename pattern exactly like the reference's
  * registry loop (validate.py:63-88); each file runs its format's
  * one-pass rule battery; findings print as `<file> <severity> <rule>:
  * <message>` and the exit code is 1 when any error fired.
  */
object ValidateCli {

  def fileType(name: String, center: String = ""): String = name match {
    case n if n.startsWith("data_clinical_supp_sample")  => "clinical_sample"
    case n if n.startsWith("data_clinical_supp_patient") => "clinical_patient"
    case n if n.endsWith(".maf") || n.startsWith("data_mutations") => "maf"
    case n if n.endsWith(".vcf")                          => "vcf"
    case n if n.endsWith(".bed")                          => "bed"
    case n if n.endsWith(".seg")                          => "seg"
    case n if n.endsWith(".yaml") || n.endsWith(".yml")   => "assay"
    // exact registry names (cna.py:120-121, structural_variant.py:18-19,
    // mutationsInCis.py:31-33)
    case n if n.startsWith("data_CNA") && n.endsWith(".txt") &&
              (center.isEmpty || n == s"data_CNA_$center.txt") => "cna"
    case "data_sv.txt"                                    => "sv"
    case "mutationsInCis_filtered_samples.csv"            => "mutationsInCis"
    // exact-name retraction lists (sampleRetraction.py:26-27,
    // patientRetraction.py:8-9: same class, different id column)
    case "sampleRetraction.csv"                           => "sampleRetraction"
    case "patientRetraction.csv"                          => "patientRetraction"
    // workflow md passthrough: {center}*.md (workflow.py:16-19)
    case n if n.endsWith(".md") && (center.isEmpty || n.startsWith(center)) => "workflow"
    case _                                                => "unknown"
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: ValidateCli <center> <inputDir>")
    val Array(center, inputDir) = args
    val spark = GraftSession.builder(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val anyError = run(spark, center, inputDir)
    println(if (anyError) "RESULT: INVALID" else "RESULT: VALID")
    spark.stop()
    if (anyError) sys.exit(1)
  }

  /** Validate every recognized file in `inputDir`; returns whether any
    * error-severity finding fired (the CLI's exit-code source). Split
    * from main() so specs can drive the full dispatch without sys.exit.
    */
  def run(spark: SparkSession, center: String, inputDir: String): Boolean = {
    val files = Files.list(Paths.get(inputDir)).iterator().asScala
      .map(_.toString).toSeq.sorted
    var anyError = false

    val samplePath  = files.find(f => fileType(Paths.get(f).getFileName.toString) == "clinical_sample")
    val patientPath = files.find(f => fileType(Paths.get(f).getFileName.toString) == "clinical_patient")
    (samplePath, patientPath) match {
      case (Some(sp), Some(pp)) =>
        val res = ClinicalFormat.validate(
          Tsv.readAllString(spark, sp), Tsv.readAllString(spark, pp), center)
        res.findings.filter(_.count > 0).foreach { f =>
          println(s"clinical ${f.severity} ${f.rule}: ${f.message}")
        }
        anyError ||= !res.isValid
      case (Some(_), None) =>
        println("clinical error missing_patient_file: sample file has no matching patient file")
        anyError = true
      case _ => ()
    }

    files.foreach { f =>
      val name = Paths.get(f).getFileName.toString
      fileType(name, center) match {
        case "maf" =>
          val res = MafFormat.validate(Maf.read(spark, f), center)
          res.findings.filter(_.count > 0).foreach(x =>
            println(s"$name ${x.severity} ${x.rule}: ${x.message}"))
          anyError ||= !res.isValid
        case "vcf" =>
          try {
            val res = Vcf.validate(Vcf.read(spark, f), center)
            res.findings.filter(_.count > 0).foreach(x =>
              println(s"$name ${x.severity} ${x.rule}: ${x.message}"))
            anyError ||= !res.isValid
          } catch {
            case e: IllegalArgumentException =>
              println(s"$name error not_vcf: ${e.getMessage}"); anyError = true
          }
        case "bed" =>
          try Bed.read(spark, f).count()
          catch {
            case e: IllegalArgumentException =>
              println(s"$name error bed_header: ${e.getMessage}"); anyError = true
          }
        case "seg" =>
          val res = graft.formats.SegFormat.validate(Tsv.readAllString(spark, f), center)
          res.findings.filter(_.count > 0).foreach(x =>
            println(s"$name ${x.severity} ${x.rule}: ${x.message}"))
          anyError ||= !res.isValid
        case "assay" =>
          val yamlText = new String(Files.readAllBytes(Paths.get(f)), "UTF-8")
          val res = graft.formats.AssayFormat.validate(
            graft.sources.Assay.parse(spark, yamlText), center)
          res.findings.filter(_.count > 0).foreach(x =>
            println(s"$name ${x.severity} ${x.rule}: ${x.message}"))
          anyError ||= !res.isValid
        case "cna" =>
          val res = graft.formats.CnaFormat.validate(Tsv.readAllString(spark, f), center)
          res.findings.filter(_.count > 0).foreach(x =>
            println(s"$name ${x.severity} ${x.rule}: ${x.message}"))
          anyError ||= !res.isValid
        case "sv" =>
          val res = graft.formats.SvFormat.validate(Tsv.readAllString(spark, f), center)
          res.findings.filter(_.count > 0).foreach(x =>
            println(s"$name ${x.severity} ${x.rule}: ${x.message}"))
          anyError ||= !res.isValid
        case "mutationsInCis" =>
          // csv with '#' comment lines (mutationsInCis.py:24-29)
          val df = spark.read.option("header", "true").option("comment", "#").csv(f)
          val res = graft.formats.MutationsInCisFormat.validate(df, center)
          res.findings.filter(_.count > 0).foreach(x =>
            println(s"$name ${x.severity} ${x.rule}: ${x.message}"))
          anyError ||= !res.isValid
        case "sampleRetraction" | "patientRetraction" =>
          // headerless single-column id list (S8); filename already
          // carries the semantics, nothing else to validate
          val n = spark.read.option("header", "false").csv(f).count()
          println(s"$name info retraction_ids: $n ids to retract")
        case "workflow" =>
          println(s"$name info workflow: md passthrough")
        case _ => ()
      }
    }
    anyError
  }
}
