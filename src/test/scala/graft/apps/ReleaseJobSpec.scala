package graft.apps

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Oncotree

class ReleaseJobSpec extends SparkSpec {
  import spark.implicits._

  private def inputs = {
    val clinical = Seq(
      // sample, patient, age days, oncotree, assay, birth year
      ("GENIE-C-p1-s1", "GENIE-C-p1", "12000", "LUAD", "C-A1", "1950"),
      ("GENIE-C-p2-s2", "GENIE-C-p2", ">32485", "NSCLC", "C-A1", ">89"),
      ("GENIE-C-p3-s3", "GENIE-C-p3", "9000", "GONE", "C-A1", "1960"),  // deprecated code → dropped
      ("GENIE-C-p4-s4", "GENIE-C-p4", "8000", "LUAD", "C-NOBED", "1970"), // no panel → dropped
      ("GENIE-C-p5-s5", "GENIE-C-p5", "7000", "LUAD", "C-A1", "1980")   // cis-flagged below
    ).toDF("SAMPLE_ID", "PATIENT_ID", "AGE_AT_SEQ_REPORT", "ONCOTREE_CODE", "SEQ_ASSAY_ID", "BIRTH_YEAR")

    val maf = Seq(
      // barcode, chrom, start, end, assay, t_depth, t_alt, gnomad af
      ("GENIE-C-p1-s1", "1", 150L, 151L, "C-A1", 100.0, 30.0, 0.0),     // keep
      ("GENIE-C-p1-s1", "1", 5000L, 5001L, "C-A1", 100.0, 30.0, 0.0),   // out of panel → drop
      ("GENIE-C-p1-s1", "2", 150L, 151L, "C-A1", 100.0, 30.0, 0.01),    // germline AF → drop
      ("GENIE-C-p2-s2", "2", 900L, 901L, "C-A1", 100.0, 30.0, 0.01),    // germline but whitelisted → keep
      ("GENIE-C-p5-s5", "1", 200L, 201L, "C-A1", 100.0, 30.0, 0.0),     // cis pair →
      ("GENIE-C-p5-s5", "1", 203L, 204L, "C-A1", 100.0, 31.0, 0.0)      // sample TOSS'd
    ).toDF("TUMOR_SAMPLE_BARCODE", "CHROMOSOME", "START_POSITION", "END_POSITION",
      "SEQ_ASSAY_ID", "T_DEPTH", "T_ALT_COUNT", "GNOMAD_AF")

    val bed = Seq(
      ("C-A1", "1", 100L, 300L), ("C-A1", "2", 100L, 1000L)
    ).toDF("SEQ_ASSAY_ID", "CHROMOSOME", "START_POSITION", "END_POSITION")

    val padding = Seq(("C-A1", 10)).toDF("SEQ_ASSAY_ID", "GENE_PADDING")

    val oncotree = Oncotree.toDataFrame(spark, Seq(
      Oncotree.Node("LUAD", "LUNG", "NSCLC", "Non-Small Cell Lung Cancer", "Lung Adenocarcinoma"),
      Oncotree.Node("NSCLC", "LUNG", "", "Non-Small Cell Lung Cancer", "NSCLC")))

    val whitelist = Seq(("2", 890L, 910L))
      .toDF("CHROMOSOME", "START_POSITION", "END_POSITION")

    ReleaseJob.ReleaseInputs(clinical, maf, bed, padding, oncotree, whitelist)
  }

  test("release pipeline applies F1-F10 in reference order") {
    val out = ReleaseJob.run(inputs)

    val samples = out.clinical.select("SAMPLE_ID").as[String].collect().toSet
    assert(samples == Set("GENIE-C-p1-s1", "GENIE-C-p2-s2", "GENIE-C-p5-s5"))

    val dropped = out.droppedSamples.as[String].collect().toSet
    assert(dropped == Set("GENIE-C-p3-s3", "GENIE-C-p4-s4"))

    val variants = out.maf
      .select("TUMOR_SAMPLE_BARCODE", "CHROMOSOME", "START_POSITION")
      .as[(String, String, Long)].collect().toSet
    // p1: in-panel non-germline variant kept, out-of-panel + germline dropped
    // p2: whitelisted germline kept; p5: cis-TOSS'd sample gone entirely
    assert(variants == Set(
      ("GENIE-C-p1-s1", "1", 150L),
      ("GENIE-C-p2-s2", "2", 900L)))

    // F8/F7 applied: day ages → years, sentinels redacted
    val byId = out.clinical.select("SAMPLE_ID", "AGE_AT_SEQ_REPORT", "BIRTH_YEAR")
      .as[(String, String, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(byId("GENIE-C-p1-s1") == (("32", "1950")))
    assert(byId("GENIE-C-p2-s2") == ((">89", "cannotReleaseHIPAA")))
  }

  test("artifacts: cBioPortal layout written end-to-end") {
    val dir = tmpDir("release")
    val out = ReleaseJob.run(inputs)
    ReleaseJob.writeArtifacts(out, dir, "genie_test")
    val clinical = scala.io.Source.fromFile(s"$dir/data_clinical_sample.txt").getLines().toSeq
    assert(clinical.take(4).forall(_.startsWith("#")))
    assert(clinical.exists(_.contains("Non-Small Cell Lung Cancer")))
    assert(new java.io.File(s"$dir/case_lists").listFiles().nonEmpty)
  }

  test("data_gene_matrix: panel-level cna/sv flags, WES panels excluded") {
    val clinical = Seq(
      ("s1", "P1"), ("s2", "P1"), ("s3", "P2"), ("s4", "WES1"), ("", "P2")
    ).toDF("SAMPLE_ID", "SEQ_ASSAY_ID")
    val cna = Seq("s1").toDF("SAMPLE_ID")      // panel P1 has CNA
    val sv  = Seq("s3").toDF("SAMPLE_ID")      // panel P2 has SV
    val m = ReleaseJob.geneMatrix(clinical, cna, sv, Seq("WES1"))
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2), r.getString(3))).toMap
    assert(m.keySet == Set("s1", "s2", "s3")) // WES + empty id dropped
    assert(m("s1") == ("P1", "P1", "NA"))
    assert(m("s2") == ("P1", "P1", "NA"))     // panel-level: s2 inherits P1's cna flag
    assert(m("s3") == ("P2", "NA", "P2"))
  }
}
