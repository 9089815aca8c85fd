package graft.stats

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-release data guide (reference:
  * templates/data_guide_template.Rnw:1-502 — a Sweave/LaTeX document
  * rendered per release, the way dashboard_markdown_generator.R drives
  * the wiki). Rendered as markdown here, the same choice
  * [[DashboardWiki]] makes: the distributed part is the panel-scale
  * aggregation over assay information; the text emit is a few KB on
  * the driver.
  *
  * Section order follows the template exactly: About this Document
  * (:148), Version of Data (:153), Data Access (:160), Terms Of Access
  * (:169), Introduction (:187 + participating-centers table :193),
  * Human Subjects Protection (:206), Summary of Sequence Pipeline
  * (:211 — panels per center :216, coverage :267, alteration types
  * :283, preservation techniques :305, assay genomic information
  * :322), Annotation/Germline Pipeline (:349), Description of Data
  * Files (:365), Clinical Data (:397), Abbreviations (:463).
  */
object DataGuide {

  /** The template's `get_list_assay_info_table`
    * (data_guide_template.Rnw:92-105): one row per assay/pipeline, one
    * column per allowed value, a check mark where the assay's
    * list-valued field contains it. Accepts either an array column or
    * the reference's ";"-separated string encoding; rows with a null
    * field are dropped (the template's `na_ind` mask).
    */
  def checkmarkTable(assay: DataFrame, idCol: String, listCol: String,
                     allowed: Seq[String], mark: String = "x"): DataFrame = {
    val isArray = assay.schema(listCol).dataType
      .isInstanceOf[org.apache.spark.sql.types.ArrayType]
    val values = if (isArray) col(listCol) else split(col(listCol), ";")
    val marks = allowed.map(v =>
      when(array_contains(values, v), lit(mark)).otherwise(lit("")).as(v))
    assay.filter(col(listCol).isNotNull)
      .select(col(idCol) +: marks: _*)
      .orderBy(idCol)
  }

  /** Fixed file-description rows (data_guide_template.Rnw:372-393),
    * filtered to the files a release actually carries — gene panels
    * and meta files are layout plumbing the template's table omits.
    */
  private[stats] val fileDescriptions: Seq[(String, String)] = Seq(
    "data_mutations_extended.txt" -> "Mutation data (MAF format)",
    "data_CNA.txt" -> "Discretized copy number data. Note: Not all centers contributed copy number data.",
    "data_sv.txt" -> "Structural variant data. Note: not all centers contributed structural rearrangement data.",
    "genomic_information.txt" -> "Genomic coordinates covered by all platforms; Hugo_Symbol is re-mapped from gene positions, includeInPanel defines gene panel files.",
    "assay_information.txt" -> "Assay information: GDC read-group fields, number_of_genes, variant_classifications, gene_padding for the inBED filter, alteration_types, specimen types, calling_strategy, coverage.",
    "data_cna_hg19.seg" -> "Segmented copy number data (SEG format). Note: Not all centers contributed copy number data.",
    "data_clinical.txt" -> "De-identified tier 1 clinical data. See the Clinical Data section.",
    "data_clinical_sample.txt" -> "Sample-level clinical attributes.",
    "data_clinical_patient.txt" -> "Patient-level clinical attributes.",
    "data_gene_matrix.txt" -> "Per-sample gene panel assignments for mutations, CNA and SV profiles.")

  /** Clinical field dictionary (data_guide_template.Rnw:400-445) —
    * rendered only for the columns the release's clinical table
    * actually carries.
    */
  private[stats] val clinicalFields: Seq[(String, String, String)] = Seq(
    ("AGE_AT_SEQ_REPORT", "Integer values, <18 or >89",
      "Age of the patient when sequencing results were reported; masked outside [18, 89]."),
    ("CENTER", "MSK", "The center submitting the clinical and genomic data."),
    ("ETHNICITY", "Non-Spanish/non-Hispanic",
      "Spanish/Hispanic origin (NAACCR v16 #190); Unknown when not collected."),
    ("ONCOTREE_CODE", "LUAD",
      "Primary cancer diagnosis code from the OncoTree ontology."),
    ("PATIENT_ID", "GENIE-JHU-1234",
      "Anonymized patient identifier: GENIE-CENTER-1234."),
    ("PRIMARY_RACE", "Asian",
      "Primary race (NAACCR v16 #160); Unknown when not collected."),
    ("SAMPLE_ID", "GENIE-JHU-1234-9876",
      "Anonymized sample identifier: GENIE-CENTER-1234-9876."),
    ("SAMPLE_TYPE", "Primary", "The specimen's type (primary, metastasis, ...)."),
    ("SAMPLE_TYPE_DETAILED", "Primary tumor",
      "The specimen's detailed type based on its location."),
    ("SEQ_ASSAY_ID", "DFCI-ONCOPANEL-1",
      "Institutional assay identifier; first component is the center abbreviation."),
    ("SEX", "Female, Male", "The patient's sex code (NAACCR v16 #220)."),
    ("CANCER_TYPE", "Non-Small Cell Lung Cancer",
      "OncoTree main type of the primary cancer diagnosis."),
    ("CANCER_TYPE_DETAILED", "Lung Adenocarcinoma",
      "OncoTree label of the primary cancer diagnosis."),
    ("BIRTH_YEAR", "1965", "Four-digit year of the patient's date of birth."),
    ("YEAR_CONTACT", "1990", "Year the patient was last known to be alive."),
    ("YEAR_DEATH", "2010", "Year of death."),
    ("INT_CONTACT", "15000", "Interval in days from DOB to date of last contact."),
    ("INT_DOD", "15000", "Interval in days from DOB to date of death."),
    ("DEAD", "Yes / No", "Is this patient known to be deceased?"))

  private val abbreviations: Seq[(String, String)] = Seq(
    "AACR" -> "American Association for Cancer Research",
    "CNA" -> "Copy number alterations",
    "CNV" -> "Copy number variants",
    "FFPE" -> "Formalin-fixed, paraffin-embedded",
    "GENIE" -> "Genomics, Evidence, Neoplasia, Information, Exchange",
    "HIPAA" -> "Health Insurance Portability and Accountability Act",
    "IRB" -> "Institutional Review Board",
    "MAF" -> "Mutation annotation format",
    "NAACCR" -> "North American Association of Central Cancer Registries",
    "NGS" -> "Next-generation sequencing",
    "PCR" -> "Polymerase chain reaction",
    "SNP" -> "Single-nucleotide polymorphism",
    "SNV" -> "Single-nucleotide variants",
    "VCF" -> "Variant Call Format")

  private def staticTable(header: (String, String),
                          rows: Seq[(String, String)]): String = {
    def esc(s: String) = s.replace("|", "\\|")
    (Seq(s"| ${header._1} | ${header._2} |", "| --- | --- |") ++
      rows.map { case (a, b) => s"| ${esc(a)} | ${esc(b)} |" }).mkString("\n")
  }

  /** Render the guide. `assayInfo` drives every data-driven table; the
    * pipeline identity column is SEQ_PIPELINE_ID when present (the
    * template's dedup key, Rnw:127) falling back to SEQ_ASSAY_ID, and
    * the center column is CENTER when present falling back to the
    * SEQ_ASSAY_ID prefix. `dataFiles` is the release manifest;
    * `clinicalColumns` the released clinical table's columns.
    */
  def render(release: String, assayInfo: DataFrame,
             dataFiles: Seq[String], clinicalColumns: Seq[String],
             centers: Option[DataFrame] = None,
             oncotreeVersion: Option[String] = None): String = {
    import graft.formats.AssayFormat
    val sb = new StringBuilder
    val safeTitle = release.replace("'", "''")
      .replace("\r", " ").replace("\n", " ")
    sb ++= s"---\ntitle: '$safeTitle Data Guide'\n---\n"

    sb ++= "\n## About this Document\n\n"
    sb ++= s"This document provides an overview of the $release release.\n"

    sb ++= "\n## Version of Data\n\n"
    sb ++= s"Data version: $release. Versions follow semantic versioning " +
      "(major.patch-release-type): major releases add new sample data, " +
      "patch releases correct them (including retractions), and the " +
      "release type is public or consortium.\n"
    oncotreeVersion.foreach(v =>
      sb ++= s"OncoTree ontology version for this release: $v.\n")

    sb ++= "\n## Data Access\n\n"
    sb ++= "Released data is available through the release folder layout " +
      "written by the release job and through a cBioPortal-compatible " +
      "study export.\n"

    sb ++= "\n## Terms Of Access\n\n"
    sb ++= "- Users will not attempt to identify or contact individual " +
      "participants from whom these data were collected.\n"
    sb ++= "- Users will not redistribute the data without express " +
      "written permission.\n"

    sb ++= "\n## Introduction\n\n"
    sb ++= "This release aggregates clinical-grade genomic and clinical " +
      "data contributed by the participating centers below.\n"
    centers.foreach { c =>
      sb ++= "\n"; sb ++= DashboardWiki.mdTable(c); sb ++= "\n"
    }

    sb ++= "\n## Human Subjects Protection and Privacy\n\n"
    sb ++= "Each participating center shares data consistent with patient " +
      "consent and center-specific IRB policies; all data is " +
      "de-identified via the HIPAA Safe Harbor Method.\n"

    sb ++= "\n## Summary of Sequence Pipeline\n\n"
    val idCol =
      if (assayInfo.columns.contains("SEQ_PIPELINE_ID")) "SEQ_PIPELINE_ID"
      else "SEQ_ASSAY_ID"
    // one row per pipeline, the template's !duplicated() (Rnw:127)
    val pipelines = assayInfo.dropDuplicates(idCol)
    val centerCol =
      if (assayInfo.columns.contains("CENTER")) col("CENTER")
      else try_element_at(split(col(idCol), "-"), lit(1))
    sb ++= "### Panels and pipelines per center\n\n"
    sb ++= DashboardWiki.mdTable(
      pipelines.groupBy(centerCol.as("Center"))
        .agg(count(lit(1)).as("Number of Panels/Pipelines"))
        .orderBy("Center"))
    sb ++= "\n"
    // the three checkmark matrices, for the columns this release carries
    Seq(
      ("COVERAGE", "Coverage per Panel/Pipeline", AssayFormat.coverage),
      ("ALTERATION_TYPES", "Alteration Types per Panel/Pipeline",
        AssayFormat.alterationTypes),
      ("PRESERVATION_TECHNIQUE", "Preservation Techniques per Panel/Pipeline",
        AssayFormat.preservation)
    ).foreach { case (c, title, allowed) =>
      if (pipelines.columns.contains(c)) {
        sb ++= s"\n### $title\n\n"
        sb ++= DashboardWiki.mdTable(
          checkmarkTable(pipelines, idCol, c, allowed))
        sb ++= "\n"
      }
    }
    val genomicCols = Seq("CALLING_STRATEGY", "NUMBER_OF_GENES",
      "TARGET_CAPTURE_KIT").filter(assayInfo.columns.contains)
    if (genomicCols.nonEmpty) {
      sb ++= "\n### Sequence Assay Genomic Information\n\n"
      sb ++= DashboardWiki.mdTable(
        assayInfo
          .select((Seq("SEQ_ASSAY_ID") ++ genomicCols).map(col): _*)
          .orderBy("SEQ_ASSAY_ID"))
      sb ++= "\n"
    }

    sb ++= "\n## Pipeline for Annotating Mutations and Filtering Putative Germline SNPs\n\n"
    sb ++= "Center-submitted VCF/MAF variants are converted to a complete " +
      "MAF with annotation; putative germline variants are removed by a " +
      "uniform filter that flags variants whose population allele " +
      "frequency reaches 0.0005 in any gnomAD subpopulation, after " +
      "excluding known somatic hotspots.\n"

    sb ++= "\n## Description of Data Files\n\n"
    val present = fileDescriptions.filter(f => dataFiles.contains(f._1))
    sb ++= staticTable("File Name" -> "Description", present)
    sb ++= "\n"

    sb ++= "\n## Clinical Data\n\n"
    val cc = clinicalColumns.map(_.toUpperCase).toSet
    sb ++= staticTable("Data Element" -> "Data Description",
      clinicalFields.collect { case (f, ex, desc) if cc.contains(f) =>
        f -> s"Example: $ex. $desc" })
    sb ++= "\n"

    sb ++= "\n## Abbreviations and Acronym Glossary\n\n"
    sb ++= staticTable("Abbreviation" -> "Full Term", abbreviations)
    sb ++= "\n"
    sb.toString
  }

  def write(md: String, path: String): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.write(p, md.getBytes(StandardCharsets.UTF_8))
  }
}
