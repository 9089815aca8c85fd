package graft.stats

import graft.SparkSpec

class DataGuideSpec extends SparkSpec {
  import spark.implicits._

  private val assay = Seq(
    ("CTR-P1", "tumor_only", 50L, "KitA", "coding_exons;introns", "FFPE"),
    ("CTR-P2", "tumor_normal", 300L, "KitB", "coding_exons", "FFPE;fresh_frozen"),
    ("XYZ-P1", "tumor_only", 120L, "KitC", null, "fresh_frozen")
  ).toDF("SEQ_ASSAY_ID", "CALLING_STRATEGY", "NUMBER_OF_GENES",
    "TARGET_CAPTURE_KIT", "COVERAGE", "PRESERVATION_TECHNIQUE")

  test("data guide renders the template's sections in order") {
    val md = DataGuide.render("15.1-consortium", assay,
      dataFiles = Seq("data_mutations_extended.txt", "data_CNA.txt",
        "data_clinical.txt", "meta_study.txt"),
      clinicalColumns = Seq("SAMPLE_ID", "PATIENT_ID", "SEX", "CANCER_TYPE"),
      oncotreeVersion = Some("oncotree_2021_11_02"))
    // section order mirrors data_guide_template.Rnw:148-463
    val sections = Seq(
      "## About this Document", "## Version of Data", "## Data Access",
      "## Terms Of Access", "## Introduction",
      "## Human Subjects Protection and Privacy",
      "## Summary of Sequence Pipeline",
      "### Panels and pipelines per center",
      "### Coverage per Panel/Pipeline",
      "### Preservation Techniques per Panel/Pipeline",
      "### Sequence Assay Genomic Information",
      "## Pipeline for Annotating Mutations and Filtering Putative Germline SNPs",
      "## Description of Data Files", "## Clinical Data",
      "## Abbreviations and Acronym Glossary")
    val idx = sections.map(md.indexOf)
    assert(idx.forall(_ >= 0), s"missing sections: " +
      sections.zip(idx).filter(_._2 < 0).map(_._1).mkString(", "))
    assert(idx == idx.sorted, "sections out of template order")
    // release id and oncotree version reach the text
    assert(md.contains("'15.1-consortium Data Guide'"))
    assert(md.contains("oncotree_2021_11_02"))
    // the ALTERATION_TYPES matrix is absent — this release has no column
    assert(!md.contains("Alteration Types per Panel/Pipeline"))
    // file table lists only described release files, never meta plumbing
    assert(md.contains("data_mutations_extended.txt"))
    assert(!md.contains("genomic_information.txt"))
    assert(!md.contains("meta_study.txt"))
    // clinical dictionary filtered to the released columns
    assert(md.contains("| SEX |") && md.contains("| CANCER_TYPE |"))
    assert(!md.contains("| BIRTH_YEAR |"))
  }

  test("checkmark matrix marks ;-separated membership, drops null rows") {
    val rows = DataGuide.checkmarkTable(assay, "SEQ_ASSAY_ID", "COVERAGE",
        graft.formats.AssayFormat.coverage)
      .collect().map(r => r.getString(0) ->
        (1 until r.length).map(r.getString).toSeq).toMap
    // allowed order: hotspot_regions, coding_exons, introns, promoters
    assert(rows("CTR-P1") == Seq("", "x", "x", ""))
    assert(rows("CTR-P2") == Seq("", "x", "", ""))
    assert(!rows.contains("XYZ-P1"), "null list row must drop (Rnw:93 na mask)")
  }

  test("per-center pipeline counts derive centers from the assay prefix") {
    val md = DataGuide.render("v1", assay, dataFiles = Nil,
      clinicalColumns = Nil)
    assert(md.contains("| CTR | 2 |") && md.contains("| XYZ | 1 |"), md)
  }
}
