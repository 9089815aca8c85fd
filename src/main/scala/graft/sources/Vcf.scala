package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** VCF reader (SURVEY §2.1 S4; reference vcf.py:32-91).
  *
  * VCF prepends `##` meta lines and a `#CHROM ...` header line. The
  * reference scans for the header then re-reads with those names. Spark
  * shape: one pass over `spark.read.text` to find the header (cheap —
  * headers sit in the first KB of the first partition), then a schema'd
  * csv read of the body with `#`-comment skipping; the same NA contract
  * as MAF applies (REF/ALT keep literal "NA").
  */
object Vcf {

  /** The 8 always-required headers (vcf.py:113-130); FORMAT is required
    * only when tumor/normal sample columns are present (the 10/11-column
    * rule, vcf.py:131-160).
    */
  val requiredHeaders: Seq[String] =
    Seq("#CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER", "INFO")

  /** Locate the `#CHROM` header line and return its column names. */
  def headerColumns(spark: SparkSession, path: String): Seq[String] = {
    val header = spark.read.text(path)
      .filter(col("value").startsWith("#CHROM"))
      .limit(1).collect().headOption
      .map(_.getString(0))
      .getOrElse(throw new IllegalArgumentException(
        s"$path: no #CHROM header line — not a VCF"))
    header.stripPrefix("#").split("\t", -1).toSeq
  }

  /** S4: read body rows with the located header names; allele columns
    * (REF/ALT) keep NA literals, the rest are NA-normalized.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val cols = headerColumns(spark, path)
    val body = spark.read
      .option("sep", "\t")
      .option("comment", "#")
      .option("nullValue", "")
      .csv(path)
      .toDF(cols: _*)
    val exempt = Set("REF", "ALT")
    body.select(body.columns.toIndexedSeq.map { c =>
      if (exempt.contains(c.toUpperCase)) col(c)
      else when(col(c).isin(Maf.naStrings: _*), lit(null)).otherwise(col(c)).as(c)
    }: _*)
  }

  /** Per-row whitespace smell count (vcf.py:13-15, 166-169): number of
    * rows where any column value contains a space.
    */
  def whitespaceViolations(df: DataFrame): Long = {
    val anySpace = df.columns.map(c => coalesce(col(c).cast("string").contains(" "), lit(false)))
      .reduce(_ || _)
    df.filter(anySpace).count()
  }

  /** P20 (vcf.py:92-275): structured validation of a read VCF frame
    * (columns as [[read]] yields them — '#' stripped from CHROM).
    * Messages verbatim from the reference, including the 10/11-column
    * tumor/normal sample rules.
    */
  def validate(df: DataFrame, center: String): graft.rules.ValidationResult = {
    import graft.rules.Finding
    val cols = df.columns.toSeq
    var findings = Vector.empty[Finding]
    def add(rule: String, sev: String, count: Long, msg: String): Unit =
      findings :+= Finding(rule, sev, count, None, msg)

    val required = Seq("CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER", "INFO", "FORMAT")
    if (!required.forall(cols.contains)) {
      add("missing_headers", "error", 1,
        "vcf: Must have these headers: CHROM, POS, ID, REF, ALT, QUAL, FILTER, INFO, FORMAT.")
    } else {
      val dupCount = df.groupBy("CHROM", "POS", "REF", "ALT").count()
        .filter(col("count") > 1).count()
      if (dupCount > 0)
        add("duplicate_variants", "error", dupCount, "vcf: Must not have duplicate variants.")
      val aggRow = df.agg(
        sum(when(col("CHROM").isNull || col("POS").isNull, 1L).otherwise(0L)).as("n_cp"),
        sum(when(col("FORMAT").isNull, 1L).otherwise(0L)).as("n_fmt")).head()
      if (aggRow.getAs[Long]("n_cp") > 0)
        add("space_delimited", "error", aggRow.getAs[Long]("n_cp"),
          "vcf: May contain rows that are space delimited instead of tab delimited.")
      if (aggRow.getAs[Long]("n_fmt") > 0)
        add("format_missing_values", "error", aggRow.getAs[Long]("n_fmt"),
          "vcf: Must not have missing values in FORMAT column.")
    }

    // tumor/normal column-count rules (vcf.py:215-275)
    def genieIdErrs(id: String, colDesc: String): Seq[String] = {
      val prefix = if (!id.startsWith(s"GENIE-$center"))
        Seq(s"vcf: $colDesc must start with GENIE-$center") else Nil
      val len = if (id.length >= 50)
        Seq(s"vcf: $colDesc must have less than 50 characters.") else Nil
      prefix ++ len
    }
    var sampleId: Option[String] = None
    var normalId: Option[String] = None
    if (cols.length > 11)
      add("too_many_columns", "error", 1,
        "vcf: Should not have more than 11 columns. Only single sample or " +
          "matched tumor normal vcf files are accepted.")
    else if (cols.length == 11) {
      sampleId = Some(cols(cols.length - 2)); normalId = Some(cols.last)
      genieIdErrs(sampleId.get, "tumor sample column")
        .foreach(m => add("tumor_sample_column", "error", 1, m))
      genieIdErrs(normalId.get, "normal sample column")
        .foreach(m => add("normal_sample_column", "error", 1, m))
    } else if (cols.length == 10) {
      if (!cols.contains("TUMOR")) {
        sampleId = Some(cols.last)
        val errs = genieIdErrs(sampleId.get, "tumor sample column")
        if (errs.nonEmpty)
          add("tumor_sample_column", "error", 1, errs.mkString(" ") +
            " if vcf represents a single sample and TUMOR is not the sample column header.")
      } else sampleId = Some("TUMOR")
    } else
      add("too_few_columns", "error", 1,
        "vcf: Must have at least 10 columns. If the vcf represents a single " +
          "sample, then it's missing a tumor sample column. If the vcf " +
          "represents a matched tumor normal, then it's missing both normal " +
          "sample and tumor sample columns.")

    (sampleId.toSeq ++ normalId.toSeq).filter(cols.contains).foreach { c =>
      val n = df.filter(col(c).isNull).count()
      if (n > 0)
        add(s"missing_values_${c.toLowerCase}", "error", n,
          s"vcf: Must not have missing values in $c column.")
    }

    val ws = whitespaceViolations(df)
    if (ws > 0)
      add("whitespace", "warning", ws,
        "vcf: Should not have any white spaces in any of the columns.")
    graft.rules.ValidationResult(findings)
  }
}
