package graft.operators

import graft.SparkSpec

class BedRemapCisPolicySpec extends SparkSpec {
  import spark.implicits._

  test("bed remap: 90% rule, deterministic argmax, off-panel marking") {
    val bed = Seq(
      // fully inside TP53 → remap
      ("1", 110L, 190L, "submitted_a"),
      // overlaps TP53 only 50% → keep symbol, off-panel
      ("1", 150L, 350L, "submitted_b"),
      // overlaps TWO genes ≥90%: EGFR (ratio 1.0) wins over KRAS (1.0) by start
      ("2", 120L, 130L, "submitted_c"),
      // no gene at all
      ("3", 10L, 20L, "submitted_d")
    ).toDF("CHROMOSOME", "START_POSITION", "END_POSITION", "HUGO_SYMBOL")

    val genes = Seq(
      ("1", 100L, 200L, "TP53"),
      ("2", 100L, 300L, "EGFR"),
      ("2", 110L, 300L, "KRAS")
    ).toDF("CHROMOSOME", "START_POSITION", "END_POSITION", "HUGO_SYMBOL")

    val out = BedRemap.remap(bed, genes)
      .select("START_POSITION", "HUGO_SYMBOL", "IN_GENE")
      .as[(Long, String, Boolean)].collect().toSet

    assert(out == Set(
      (110L, "TP53", true),
      (150L, "submitted_b", false),
      (120L, "EGFR", true),   // tie on ratio → earlier gene start wins
      (10L, "submitted_d", false)))
  }

  test("cis policy: FLAG/KEEP/TOSS/FIXED lifecycle") {
    val detected = Seq("p_new", "p_kept", "p_tossed").toDF("pair_key")
    val review = Seq(
      ("p_kept", CisPolicy.Keep),      // center reviewed: keep
      ("p_tossed", CisPolicy.Toss),    // center reviewed: toss
      ("p_gone_flag", CisPolicy.Flag), // no longer detected → FIXED
      ("p_gone_keep", CisPolicy.Keep)  // no longer detected, decision stands
    ).toDF("pair_key", "status")

    val next = CisPolicy.reconcile(detected, review)
      .as[(String, String)].collect().toMap

    assert(next == Map(
      "p_new" -> CisPolicy.Flag,
      "p_kept" -> CisPolicy.Keep,
      "p_tossed" -> CisPolicy.Toss,
      "p_gone_flag" -> CisPolicy.Fixed,
      "p_gone_keep" -> CisPolicy.Keep))

    val pairs = Seq(("p_tossed", "GENIE-C-s5"), ("p_kept", "GENIE-C-s1"))
      .toDF("pair_key", "TUMOR_SAMPLE_BARCODE")
    val toss = CisPolicy.tossSamples(next.toSeq.toDF("pair_key", "status"), pairs)
      .as[String].collect().toSeq
    assert(toss == Seq("GENIE-C-s5"))
  }
}
