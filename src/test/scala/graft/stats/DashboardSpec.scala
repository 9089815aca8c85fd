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

  test("template: failed-annotation counts match the R helper semantics") {
    val maf = Seq(
      ("CTR", "FAILED"), ("CTR", "FAILED"), ("CTR", "SUCCESS"),
      ("XYZ", "FAILED"), ("ABC", "SUCCESS")
    ).toDF("Center", "Annotation_Status")
    val counts = Dashboard.failedAnnotationCounts(maf, Seq("Center"), "Number of failed annotations")
      .as[(String, Long)].collect().toSeq
    assert(counts == Seq(("CTR", 2L), ("XYZ", 1L))) // sorted, SUCCESS-only centers absent
  }

  test("template: center × category distribution yields within-center percentages") {
    val clin = Seq(("CTR", "1"), ("CTR", "1"), ("CTR", "2"), ("XYZ", "2"))
      .toDF("CENTER", "SEX")
    val dist = Dashboard.centerCategoryDistribution(clin, "CENTER", "SEX")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(dist(("CTR", "1")) == 66.6667) // 2 of 3, rounded to 4 places
    assert(dist(("CTR", "2")) == 33.3333)
    assert(dist(("XYZ", "2")) == 100.0)
  }

  test("template: release-content table merges sample + variant counts with Total") {
    val samples = Seq(("CTR", "s1"), ("CTR", "s2"), ("XYZ", "s3")).toDF("CENTER", "SAMPLE_ID")
    val muts = Seq("CTR", "CTR", "NEW").toDF("CENTER")
    val rows = Dashboard.releaseContent(samples, muts, "CENTER", "SAMPLE_ID")
      .as[(String, Long, Long)].collect().toSet
    assert(rows == Set(
      ("CTR", 2L, 2L), ("XYZ", 1L, 0L), ("NEW", 0L, 1L), ("Total", 3L, 3L)))
  }

  test("wiki: markdown document renders template sections from the gated tables") {
    val samples = Seq(("CTR", "s1"), ("CTR", "s2"), ("XYZ", "s3")).toDF("CENTER", "SAMPLE_ID")
    val muts = Seq("CTR", "CTR", "NEW").toDF("CENTER")
    val maf = Seq(("CTR", "FAILED"), ("XYZ", "FAILED"), ("XYZ", "FAILED"),
      ("CTR", "SUCCESS")).toDF("Center", "Annotation_Status")
    val clin = Seq(("CTR", "1"), ("CTR", "1"), ("CTR", "2"), ("XYZ", "2"))
      .toDF("CENTER", "SEX")

    val md = DashboardWiki.render(
      release = "14.1-consortium",
      releaseContent = Dashboard.releaseContent(samples, muts, "CENTER", "SAMPLE_ID")
        .orderBy("Center"),
      failedAnnotations = Dashboard.failedAnnotationCounts(maf, Seq("Center")),
      attributeDistributions = Seq(
        "Sex" -> Dashboard.centerCategoryDistribution(clin, "CENTER", "SEX")
          .orderBy("CENTER", "SEX")))

    // section structure, in template order
    val sections = Seq(
      "## Sample and Variant Count per center",
      "## GENIE Retraction Policy",
      "### Genome nexus failed annotations summary",
      "## Distribution of Clinical Attributes",
      "### Sex")
    val idx = sections.map(md.indexOf)
    assert(idx.forall(_ >= 0), s"missing sections in:\n$md")
    assert(idx == idx.sorted, "sections out of template order")
    assert(md.startsWith("---\ntitle: '14.1-consortium'\n---"))

    // numbers come from the gated aggregations, pipe-table formatted
    assert(md.contains("| Total | 3 | 3 |"))
    assert(md.contains("| CTR | 2 | 2 |"))
    assert(md.contains("| Center | Number of failed annotations |"))
    assert(md.contains("| XYZ | 2 |"))
    assert(md.contains("| CTR | 1 | 2 | 66.6667 |"))

    // file sink round-trip
    val out = tmpDir("wiki") + "/dashboard.md"
    DashboardWiki.write(md, out)
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out)), "UTF-8") == md)

    // the driver-small guard trips on an unaggregated frame
    val big = spark.range(2000).toDF("x")
    intercept[IllegalArgumentException] { DashboardWiki.mdTable(big) }
  }

  test("wiki: hostile values cannot break the YAML front matter or the pipe tables") {
    import spark.implicits._
    // single quote in the release id: YAML single-quoted scalars escape
    // by doubling; line breaks flatten to spaces
    val md = DashboardWiki.render("Ja'n's\nrelease",
      Seq(("C|TR", "a\nmulti\r\nline", 1L)).toDF("Center", "Note", "n"),
      Seq(("CTR", 0L)).toDF("Center", "Number of failed annotations"),
      attributeDistributions = Nil)
    assert(md.startsWith("---\ntitle: 'Ja''n''s release'\n---"))
    // cell pipes escaped, cell line breaks become <br> — each data row
    // stays exactly one physical line
    assert(md.contains("| C\\|TR | a<br>multi<br>line | 1 |"))
    val tableLines = md.linesIterator.filter(_.startsWith("| C")).toSeq
    assert(tableLines.exists(_.contains("C\\|TR")))
  }
}
