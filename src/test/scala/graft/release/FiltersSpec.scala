package graft.release

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.rules.CrossFileChecks

class FiltersSpec extends SparkSpec {
  import spark.implicits._

  test("F14: column name searched case-insensitively, value matched exactly, nulls kept") {
    // reference (database_to_staging.py:862-881): column lookup ignores
    // case, but the value compare is exact != "GERMLINE"
    val sv = Seq(("s1", "GERMLINE"), ("s2", "Germline"), ("s3", "SOMATIC"), ("s4", null))
      .toDF("SAMPLE_ID", "SV_Status")
    val kept = Filters.dropGermline(sv, "SV_STATUS").select("SAMPLE_ID").as[String].collect().toSet
    assert(kept == Set("s2", "s3", "s4"))
    // no matching column → no-op
    assert(Filters.dropGermline(sv, "MUTATION_STATUS").count() == 4)
  }

  test("F9: seq-date window keeps recent samples, Release maps to Jan-1900") {
    val clinical = Seq(
      ("s1", "Jan-2017"),  // 0 days before processing → kept
      ("s2", "Jul-2016"),  // ~184 days before → outside a 180-day window
      ("s3", "Release"),   // → Jan-1900, never kept
      ("s4", "Dec-2016")   // 31 days before → kept
    ).toDF("SAMPLE_ID", "SEQ_DATE")
    val kept = Filters.seqDateKeepSamples(clinical, "Jan-2017", days = 180)
      .as[String].collect().toSet
    assert(kept == Set("s1", "s4"))
  }

  test("C2: checkGenieId reformatting matches the reference branches") {
    val df = Seq("C-1", "GENIE-C-2", "3", "GENIE-X-4").toDF("id")
    val out = df.select(graft.rules.Rules.checkGenieId(col("id"), "C"))
      .as[String].collect().toSeq
    assert(out == Seq("GENIE-C-1", "GENIE-C-2", "GENIE-C-3", "GENIE-C-GENIE-X-4"))
  }

  test("F11: retraction removes samples and leaves the rest") {
    val db = Seq("s1", "s2", "s3").toDF("SAMPLE_ID")
    val retracted = Seq("s2").toDF("SAMPLE_ID")
    assert(Filters.retract(db, retracted, "SAMPLE_ID").as[String].collect().toSet == Set("s1", "s3"))
  }

  test("F13: common_variant containment filter keeps nulls") {
    val maf = Seq(("v1", "PASS"), ("v2", "common_variant;other"), ("v3", null))
      .toDF("ID", "FILTER")
    val kept = Filters.dropCommonVariants(maf, "FILTER").select("ID").as[String].collect().toSet
    assert(kept == Set("v1", "v3"))
  }

  test("standardize: case/underscore/whitespace normalization for cross-file compare") {
    val df = Seq("  ctr_a1 ", "CTR-A1").toDF("v")
    val out = df.select(CrossFileChecks.standardize(col("v"))).as[String].collect().toSet
    assert(out == Set("CTR-A1"))
  }

  test("F1: germline keep with empty AF column list keeps everything") {
    val maf = Seq(("v1", false), ("v2", true)).toDF("ID", "WL")
    val kept = maf.filter(Filters.germlineKeep(Nil, 5e-4, col("WL")))
      .select("ID").as[String].collect().toSet
    assert(kept == Set("v1", "v2"))
  }
}
