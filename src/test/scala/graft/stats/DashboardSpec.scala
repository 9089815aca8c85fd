package graft.stats

import graft.SparkSpec

class DashboardSpec extends SparkSpec {
  import spark.implicits._

  private val samples = Seq(
    ("CTR", "s1", "LUAD", "x"), ("CTR", "s2", "BRCA", ""),
    ("XYZ", "s3", "LUAD", "Not Collected"), ("XYZ", "s3", "LUAD", "y")
  ).toDF("CENTER", "SAMPLE_ID", "CODE", "NOTES")

  test("A2: per-center counts with Total row") {
    val out = Dashboard.countsPerCenter(samples, "CENTER", "SAMPLE_ID")
      .as[(String, Long)].collect().toMap
    assert(out == Map("CTR" -> 2L, "XYZ" -> 1L, "Total" -> 3L))
  }

  test("A3: crosstab with explicit centers and row totals") {
    val rows = Dashboard.crosstab(samples, "CODE", "CENTER", Seq("CTR", "XYZ"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows("LUAD") == ((1L, 2L, 3L)))
    assert(rows("BRCA") == ((1L, 0L, 1L)))
  }

  test("A4: completeness with missing tokens") {
    val out = Dashboard.completeness(samples, Seq("NOTES")).collect()(0).getDouble(0)
    assert(out == 0.5) // "x","y" complete; "","Not Collected" not
  }

  test("A10/J8: decreases and release diffs") {
    val prior = Seq("a", "a", "b").toDF("v")
    val cur   = Seq("a", "b", "b").toDF("v")
    val dec = Dashboard.valueDecreases(cur, prior, "v").as[(String, Long, Long)].collect()
    assert(dec.toSeq == Seq(("a", 1L, 2L)))

    val priorR = Seq(("CTR", "s1"), ("CTR", "s2")).toDF("CENTER", "SAMPLE_ID")
    val curR   = Seq(("CTR", "s1"), ("XYZ", "s9")).toDF("CENTER", "SAMPLE_ID")
    val diff = Dashboard.releaseDiff(curR, priorR, "CENTER", "SAMPLE_ID")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(diff == Map("CTR" -> -1L, "XYZ" -> 1L))
  }
}
