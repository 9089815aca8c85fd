package graft.operators

import graft.SparkSpec

class AnnotatorSpec extends SparkSpec {
  import spark.implicits._

  private val variants = Seq(("1", "100", "A", "T"), ("2", "200", "G", "C"))
    .toDF("CHROM", "POS", "REF", "ALT")

  test("passthrough annotator stamps constant annotation columns") {
    val out = new PassthroughAnnotator(Map("Annotation_Status" -> "SUCCESS"))
      .annotate(variants)
    assert(out.columns.contains("Annotation_Status"))
    assert(out.filter($"Annotation_Status" === "SUCCESS").count() == 2)
  }

  test("pipe annotator streams partitions through an external process") {
    // `cat` = identity annotation; proves the partition-local process
    // plumbing (the real deployment swaps in the annotation CLI)
    val out = new PipeAnnotator(Seq("cat"), Seq("CHROM", "POS", "REF", "ALT"))
      .annotate(variants)
    assert(out.as[(String, String, String, String)].collect().toSet ==
      Set(("1", "100", "A", "T"), ("2", "200", "G", "C")))

    // a transforming command: awk upper-cases nothing but swaps REF/ALT
    val swapped = new PipeAnnotator(
      Seq("awk", "-F\t", "{print $1\"\t\"$2\"\t\"$4\"\t\"$3}"),
      Seq("CHROM", "POS", "REF", "ALT")).annotate(variants)
    assert(swapped.filter($"CHROM" === "1").select("REF").as[String].collect()(0) == "T")
  }
}
