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
    body.select(body.columns.map { c =>
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
}
