package graft.formats

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FormatsSpec extends SparkSpec {
  import spark.implicits._

  test("CNA: melt → validate → merge duplicates → explicit pivot") {
    val wide = Seq(
      ("TP53", Some(1.0), Some(0.0)),
      ("EGFR", Some(-1.0), Some(7.0)),   // 7.0 out of domain
      ("TP53", Some(0.0), Some(2.0))     // dup symbol (post-remap collision)
    ).toDF("Hugo_Symbol", "S1", "S2")

    val long = CnaFormat.melt(wide)
    assert(long.count() == 6)
    assert(CnaFormat.invalidValues(long).count() == 1)

    val merged = CnaFormat.mergeDuplicateGenes(long.filter(col("VALUE") =!= 7.0))
    val tp53 = merged.filter($"HUGO_SYMBOL" === "TP53")
      .select("SAMPLE_ID", "VALUE").as[(String, Option[Double])].collect().toMap
    // S1: {1.0, 0.0} → two distinct with a zero → nonzero 1.0
    assert(tp53("S1").contains(1.0))
    // S2: {0.0, 2.0} → nonzero 2.0
    assert(tp53("S2").contains(2.0))

    val wideOut = CnaFormat.toWide(merged, Seq("S1", "S2"))
    assert(wideOut.columns.toSeq == Seq("HUGO_SYMBOL", "S1", "S2"))
    assert(wideOut.count() == 2)
  }

  test("CNA: cross-center merge replaces the shell join") {
    val a = Seq(("TP53", "S1", 1.0)).toDF("HUGO_SYMBOL", "SAMPLE_ID", "VALUE")
    val b = Seq(("TP53", "S2", -1.0), ("KRAS", "S2", 0.0)).toDF("HUGO_SYMBOL", "SAMPLE_ID", "VALUE")
    val merged = CnaFormat.mergeCenters(Seq(a, b))
    assert(merged.count() == 3)
    assert(merged.filter($"HUGO_SYMBOL" === "KRAS").count() == 1)
  }

  test("SEG: battery flags chrom/integer/numeric/nulls") {
    val seg = Seq(
      ("GENIE-CTR-1", "chr1", "100", "200", "5", "0.5"),
      ("GENIE-CTR-2", "99", "1.5", "200", "5", "abc"),
      ("BAD", "2", "100", null, "5", "0.5")
    ).toDF("ID", "CHROM", "LOC.START", "LOC.END", "NUM.MARK", "SEG.MEAN")
    val res = SegFormat.validate(seg, "CTR")
    val byRule = res.findings.map(f => f.rule -> f.count).toMap
    assert(byRule("id_prefix") == 1)
    assert(byRule("chr_prefix") == 1)  // warning: chr1
    assert(byRule("chrom_domain") == 1)
    assert(byRule("loc_start_int") == 1)
    assert(byRule("num_mark_int") == 0)
    assert(byRule("seg_mean_numeric") == 1)
    assert(byRule("no_nulls") == 1)
    // golden message parity incl. the reference's "integars" typo
    assert(res.findings.find(_.rule == "loc_start_int").get.message ==
      "Seg: Only integars allowed in these column(s): LOC.START.")
    assert(res.findings.find(_.rule == "seg_mean_numeric").get.message ==
      "Seg: Only numerical values allowed in SEG.MEAN.")
  }

  test("P21: full CNA validate — first column, sample ids, values, remap dups") {
    val wide = Seq(
      ("EGFR", "0", "1.5"),
      ("EGFR;ALT", "0.3", "-2"),   // 0.3 bad value; cleans to EGFR → remap dup
      ("UNKNOWN", "1", "2")        // not in bed → dropped from remap check
    ).toDF("Hugo_Symbol", "GENIE-CTR-s1", "BADCOL")
    val bed = Seq("EGFR", "TP53").toDF("HUGO_SYMBOL")
    val res = CnaFormat.validate(wide, "CTR", Some(bed))
    val byRule = res.findings.map(f => f.rule -> f).toMap
    assert(!byRule.contains("first_column")) // Hugo_Symbol ok (case-insensitive)
    assert(byRule("sample_columns").count == 1) // BADCOL
    assert(byRule("sample_columns").message == "cnv: samples must start with GENIE-CTR")
    assert(byRule("value_domain").count == 1)   // the 0.3 cell
    assert(byRule("value_domain").message ==
      "All values must be NA/blank, -2, -1.5, -1, -0.5, 0, 0.5, 1, 1.5, or 2.")
    assert(byRule("duplicate_symbols_after_remap").count == 2) // both EGFR rows

    val wrongFirst = Seq(("x", "0")).toDF("GENE", "GENIE-CTR-s1")
    assert(CnaFormat.validate(wrongFirst, "CTR").findings
      .exists(f => f.rule == "first_column" &&
        f.message == "Your cnv file's first column must be Hugo_Symbol"))
  }

  test("SV: duplicates + center extraction") {
    val sv = Seq(
      ("GENIE-CTR-1-01", "del"), ("GENIE-CTR-1-01", "del"), ("GENIE-XYZ-2-01", "dup")
    ).toDF("SAMPLE_ID", "SV_TYPE")
    val res = SvFormat.validate(sv, "CTR")
    val byRule = res.findings.map(f => f.rule -> f.count).toMap
    assert(byRule("duplicate_rows") == 1)
    assert(byRule("sample_id_prefix") == 1)
    val centers = sv.select(SvFormat.centerOf(col("SAMPLE_ID"))).distinct()
      .as[String].collect().toSet
    assert(centers == Set("CTR", "XYZ"))
  }
}
