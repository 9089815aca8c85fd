package graft.apps

import java.nio.file.{Files, Paths}

import graft.SparkSpec

class ProcessJobSpec extends SparkSpec {
  import spark.implicits._

  private def stage(dir: String): Unit = {
    Files.write(Paths.get(dir, "data_clinical_supp_sample_CTR.txt"),
      ("SAMPLE_ID\tPATIENT_ID\tAGE_AT_SEQ_REPORT\tONCOTREE_CODE\tSAMPLE_TYPE\tSEQ_ASSAY_ID\n" +
        "GENIE-CTR-p1-s1\tGENIE-CTR-p1\t1200\tLUAD\t1\tCTR-A1\n").getBytes)
    Files.write(Paths.get(dir, "data_clinical_supp_patient_CTR.txt"),
      "PATIENT_ID\tSEX\tPRIMARY_RACE\tETHNICITY\tBIRTH_YEAR\nGENIE-CTR-p1\t1\t1\t1\t1950\n".getBytes)
    Files.write(Paths.get(dir, "data_mutations_extended_CTR.maf"),
      ("CHROMOSOME\tSTART_POSITION\tEND_POSITION\tREFERENCE_ALLELE\tTUMOR_SAMPLE_BARCODE\tTUMOR_SEQ_ALLELE2\n" +
        "1\t100\t101\tA\tGENIE-CTR-p1-s1\tT\n").getBytes)
  }

  test("P29 md5-skip + validate + upsert flow, end to end twice") {
    val dir = tmpDir("process")
    stage(dir)

    // run 1: nothing prior → everything validates and lands
    val r1 = ProcessJob.run(spark, "CTR", dir, Nil, Map.empty)
    assert(r1.skipped.isEmpty)
    assert(r1.statuses.forall(_.status == "VALIDATED"))
    assert(r1.tables("clinical").count() == 1)
    assert(r1.tables("maf").count() == 1)

    // run 2 with unchanged files → P29 skips all reads
    val r2 = ProcessJob.run(spark, "CTR", dir, r1.statuses, r1.tables)
    assert(r2.skipped.toSet ==
      Set("data_clinical_supp_sample_CTR.txt", "data_clinical_supp_patient_CTR.txt",
        "data_mutations_extended_CTR.maf"))

    // run 3: modified MAF (new variant) re-validates and upserts
    Files.write(Paths.get(dir, "data_mutations_extended_CTR.maf"),
      ("CHROMOSOME\tSTART_POSITION\tEND_POSITION\tREFERENCE_ALLELE\tTUMOR_SAMPLE_BARCODE\tTUMOR_SEQ_ALLELE2\n" +
        "1\t100\t101\tA\tGENIE-CTR-p1-s1\tT\n" +
        "2\t500\t501\tG\tGENIE-CTR-p1-s1\tC\n").getBytes)
    val r3 = ProcessJob.run(spark, "CTR", dir, r1.statuses, r1.tables)
    assert(!r3.skipped.contains("data_mutations_extended_CTR.maf"))
    assert(r3.tables("maf").count() == 2)
  }

  test("multiple MAF files from one center all accumulate") {
    val dir = tmpDir("process-multi")
    val header = "CHROMOSOME\tSTART_POSITION\tEND_POSITION\tREFERENCE_ALLELE\tTUMOR_SAMPLE_BARCODE\tTUMOR_SEQ_ALLELE2\n"
    Files.write(Paths.get(dir, "data_mutations_a.maf"),
      (header + "1\t100\t101\tA\tGENIE-CTR-p1-s1\tT\n").getBytes)
    Files.write(Paths.get(dir, "data_mutations_b.maf"),
      (header + "2\t200\t201\tG\tGENIE-CTR-p1-s1\tC\n").getBytes)
    val r = ProcessJob.run(spark, "CTR", dir, Nil, Map.empty)
    assert(r.tables("maf").count() == 2) // both files' variants present
  }

  test("P30: triple clinical upload flagged as duplicate") {
    assert(ProcessJob.duplicatedFiles(Seq(
      "data_clinical_supp_sample_A.txt", "data_clinical_supp_patient_A.txt",
      "data_clinical_supp_sample_B.txt")).nonEmpty)
    assert(ProcessJob.duplicatedFiles(Seq("a.seg", "b.seg")).nonEmpty)
    assert(ProcessJob.duplicatedFiles(Seq(
      "data_clinical_supp_sample_A.txt", "data_clinical_supp_patient_A.txt", "a.seg")).isEmpty)
  }

  test("invalid upload does not reach the tables") {
    val dir = tmpDir("process-bad")
    Files.write(Paths.get(dir, "data_mutations_extended_CTR.maf"),
      ("CHROMOSOME\tSTART_POSITION\tEND_POSITION\tREFERENCE_ALLELE\tTUMOR_SAMPLE_BARCODE\tTUMOR_SEQ_ALLELE2\n" +
        "99\t100\t101\tQQ\tWRONG-1\tT\n").getBytes)
    val r = ProcessJob.run(spark, "CTR", dir, Nil, Map.empty)
    assert(r.statuses.exists(s => s.name.endsWith(".maf") && s.status == "INVALID"))
    assert(!r.tables.contains("maf"))
  }
}
