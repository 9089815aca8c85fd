package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** cBioPortal-format text sinks (SURVEY §2.1 S13-S15).
  *
  * These artifacts are deliberately small (headers, case lists, panel
  * gene lists): the distributed part is the aggregation producing them;
  * the final text write is a driver-side emit of a few KB, exactly like
  * the reference (create_case_lists.py, bed.py:444-497,
  * process_functions.py:356-403).
  */
object CbioSinks {

  final case class ClinicalHeader(label: String, description: String,
                                  dtype: String, priority: Int = 1)

  /** S13: clinical file with 4 `#`-prefixed metadata rows then data.
    * Data rows are produced distributed, headers prepended driver-side.
    */
  def writeClinical(df: DataFrame, headers: Map[String, ClinicalHeader],
                    outFile: String): Unit = {
    val cols = df.columns
    val meta = Seq(
      cols.map(c => headers.get(c).map(_.label).getOrElse(c)).mkString("#", "\t", ""),
      cols.map(c => headers.get(c).map(_.description).getOrElse(c)).mkString("#", "\t", ""),
      cols.map(c => headers.get(c).map(_.dtype).getOrElse("STRING")).mkString("#", "\t", ""),
      cols.map(c => headers.get(c).map(_.priority.toString).getOrElse("1")).mkString("#", "\t", ""))
    val dataLines = df
      .select(cols.toIndexedSeq.map(c => coalesce(col(c).cast("string"), lit(""))): _*)
      .collect()
      .map(_.toSeq.mkString("\t"))
    val content = (meta ++ Seq(cols.mkString("\t")) ++ dataLines).mkString("\n") + "\n"
    Files.createDirectories(Paths.get(outFile).getParent)
    Files.write(Paths.get(outFile), content.getBytes(StandardCharsets.UTF_8))
  }

  /** S14: one cases_*.txt per group value. The groupBy/collect_list is
    * distributed; each resulting file is a handful of lines.
    */
  def writeCaseLists(samples: DataFrame, groupCol: String, idCol: String,
                     studyId: String, outDir: String): Seq[String] = {
    Files.createDirectories(Paths.get(outDir))
    val groups = samples
      .groupBy(col(groupCol))
      .agg(sort_array(collect_set(col(idCol))).as("ids"))
      .collect()
    groups.map { r =>
      val g   = Option(r.getAs[String](groupCol)).getOrElse("NA")
      val ids = r.getAs[scala.collection.Seq[String]]("ids").toSeq
      val slug = g.toLowerCase.replaceAll("[^a-z0-9]+", "_")
      val f = s"$outDir/cases_$slug.txt"
      val content =
        s"""cancer_study_identifier: $studyId
           |stable_id: ${studyId}_$slug
           |case_list_name: $g
           |case_list_description: Samples with $g ({n} samples)
           |case_list_ids: {ids}"""
          .stripMargin
          .replace("{n}", ids.length.toString)
          .replace("{ids}", ids.mkString("\t")) + "\n"
      Files.write(Paths.get(f), content.getBytes(StandardCharsets.UTF_8))
      f
    }.toSeq
  }

  /** One explicit case list from an id set — the fixed lists the
    * reference writes besides the per-cancer-type ones
    * (create_case_lists.py:144-247: cases_all, cases_sequenced,
    * cases_cna, cases_sv, cases_cnaseq).
    */
  def writeCaseList(ids: Seq[String], slug: String, name: String,
                    studyId: String, outDir: String): String = {
    Files.createDirectories(Paths.get(outDir))
    val f = s"$outDir/cases_$slug.txt"
    val sorted = ids.sorted
    val content =
      s"""cancer_study_identifier: $studyId
         |stable_id: ${studyId}_$slug
         |case_list_name: $name
         |case_list_description: $name (${sorted.length} samples)
         |case_list_ids: ${sorted.mkString("\t")}""".stripMargin + "\n"
    Files.write(Paths.get(f), content.getBytes(StandardCharsets.UTF_8))
    f
  }

  /** Meta files for a structurally complete cBioPortal release folder
    * (database_to_staging.py:1960-2006 revises these per release; the
    * formats are the cBioPortal meta conventions the reference study
    * ships). Each is a handful of `key: value` lines — driver-side.
    */
  def writeMetaStudy(studyId: String, cohortName: String, description: String,
                     genieVersion: String, outDir: String): String = {
    Files.createDirectories(Paths.get(outDir))
    val f = s"$outDir/meta_study.txt"
    val content =
      s"""type_of_cancer: mixed
         |cancer_study_identifier: $studyId
         |name: $cohortName Cohort v$genieVersion
         |description: $description ($cohortName v$genieVersion)
         |groups: PUBLIC
         |short_name: $cohortName
         |""".stripMargin
    Files.write(Paths.get(f), content.getBytes(StandardCharsets.UTF_8))
    f
  }

  /** meta_clinical_sample.txt / meta_clinical_patient.txt. */
  def writeMetaClinical(studyId: String, patientLevel: Boolean, outDir: String): String = {
    Files.createDirectories(Paths.get(outDir))
    val (datatype, dataFile, name) =
      if (patientLevel) ("PATIENT_ATTRIBUTES", "data_clinical_patient.txt", "meta_clinical_patient.txt")
      else ("SAMPLE_ATTRIBUTES", "data_clinical_sample.txt", "meta_clinical_sample.txt")
    val f = s"$outDir/$name"
    val content =
      s"""cancer_study_identifier: $studyId
         |genetic_alteration_type: CLINICAL
         |datatype: $datatype
         |data_filename: $dataFile
         |""".stripMargin
    Files.write(Paths.get(f), content.getBytes(StandardCharsets.UTF_8))
    f
  }

  /** meta_mutations_extended.txt. */
  def writeMetaMaf(studyId: String, outDir: String): String = {
    Files.createDirectories(Paths.get(outDir))
    val f = s"$outDir/meta_mutations_extended.txt"
    val content =
      s"""cancer_study_identifier: $studyId
         |genetic_alteration_type: MUTATION_EXTENDED
         |datatype: MAF
         |stable_id: mutations
         |show_profile_in_analysis_tab: true
         |profile_name: Mutations
         |profile_description: Mutation data
         |data_filename: data_mutations_extended.txt
         |""".stripMargin
    Files.write(Paths.get(f), content.getBytes(StandardCharsets.UTF_8))
    f
  }

  /** Version revision over an existing meta file
    * (database_to_staging.py:1977-1996): find the `... v<old>` version
    * in the text, rewrite `Cohort v<old>` and ` v<old>` to the new one.
    */
  def reviseMetaVersion(path: String, newVersion: String): Unit = {
    val text = new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8)
    "name: .*Cohort v([\\w.\\-]+)".r.findFirstMatchIn(text).foreach { m =>
      val old = m.group(1)
      if (old != newVersion) {
        val out = text
          .replace(s"Cohort v$old", s"Cohort v$newVersion")
          .replace(s" v$old", s" v$newVersion")
        Files.write(Paths.get(path), out.getBytes(StandardCharsets.UTF_8))
      }
    }
  }

  /** Versioned release folder layout (database_to_staging.py:2034-2125):
    * `Release <major>/<version>/case_lists`. Returns (releaseDir,
    * caseListsDir), both created.
    */
  def releaseFolderLayout(baseDir: String, genieVersion: String): (String, String) = {
    val major = genieVersion.split("\\.").head
    val releaseDir = s"$baseDir/Release $major/$genieVersion"
    val caseLists = s"$releaseDir/case_lists"
    Files.createDirectories(Paths.get(caseLists))
    (releaseDir, caseLists)
  }

  /** S15: data_gene_panel_<id>.txt — distinct panel genes. */
  def writeGenePanel(panelGenes: DataFrame, panelId: String, outDir: String): String = {
    Files.createDirectories(Paths.get(outDir))
    val genes = panelGenes.collect().map(_.getString(0))
    val f = s"$outDir/data_gene_panel_$panelId.txt"
    val content =
      s"stable_id: $panelId\ndescription: ${genes.length} genes\ngene_list: ${genes.mkString("\t")}\n"
    Files.write(Paths.get(f), content.getBytes(StandardCharsets.UTF_8))
    f
  }
}
