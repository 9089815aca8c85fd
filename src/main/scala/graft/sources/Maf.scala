package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MAF (Mutation Annotation Format) reader (SURVEY §2.1 S3).
  *
  * The reference's subtle NA contract (maf.py:469-551, transform.py:71-89):
  * the literal strings "NA", "nan", "NaN" are VALID DATA in allele
  * columns (a reference allele can legitimately be absent) but must
  * become nulls everywhere else. pandas needs custom na_values plumbing;
  * in Spark we read everything as raw strings (nullValue="") and apply
  * an explicit null-mapping expression to the non-allele columns — a
  * single codegen'd projection, no second pass.
  */
object Maf {

  /** Columns where literal NA-ish strings are data, not missing values
    * (maf.py:524-538).
    */
  val alleleColumns: Seq[String] = Seq(
    "REFERENCE_ALLELE", "TUMOR_SEQ_ALLELE1", "TUMOR_SEQ_ALLELE2",
    "MATCH_NORM_SEQ_ALLELE1", "MATCH_NORM_SEQ_ALLELE2")

  val naStrings: Seq[String] = Seq("NA", "nan", "NaN", "")

  /** Canonical MAF column renames (process_mutation.py:21-88, abridged
    * to the families our formats use; extend per format as needed).
    */
  val columnRenames: Map[String, String] = Map(
    "CHROMOSOME"        -> "CHROMOSOME",
    "CHROM"             -> "CHROMOSOME",
    "START_POS"         -> "START_POSITION",
    "END_POS"           -> "END_POSITION",
    "REF"               -> "REFERENCE_ALLELE",
    "ALT"               -> "TUMOR_SEQ_ALLELE2",
    "TUMOR_SAMPLE_ID"   -> "TUMOR_SAMPLE_BARCODE",
    "SAMPLE_ID"         -> "TUMOR_SAMPLE_BARCODE")

  /** S3: read a MAF TSV preserving allele-column NA literals. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val raw = Tsv.readAllString(spark, path)
    normalizeNa(canonicalize(raw))
  }

  /** Apply canonical renames to whatever subset of columns is present. */
  def canonicalize(df: DataFrame): DataFrame =
    df.columns.foldLeft(df) { (d, c) =>
      columnRenames.get(c.toUpperCase) match {
        case Some(target) if target != c => d.withColumnRenamed(c, target)
        case _                           => d
      }
    }

  /** Null out NA-ish literals in every non-allele string column;
    * allele columns keep them verbatim.
    */
  def normalizeNa(df: DataFrame): DataFrame = {
    val exempt = alleleColumns.toSet
    df.select(df.columns.toIndexedSeq.map { c =>
      if (exempt.contains(c.toUpperCase) || df.schema(c).dataType != org.apache.spark.sql.types.StringType)
        col(c)
      else
        when(col(c).isin(naStrings: _*), lit(null)).otherwise(col(c)).as(c)
    }: _*)
  }

  /** Header/field-count consistency check (maf.py:217-236): every data
    * line must have the header's field count. Returns offending line
    * count — computed distributed over spark.read.text, no collect.
    */
  def fieldCountMismatches(spark: SparkSession, path: String): Long = {
    val lines = spark.read.text(path).filter(!col("value").startsWith("#"))
    val first = lines.limit(1).collect().headOption.map(_.getString(0)).getOrElse("")
    val expected = first.split("\t", -1).length
    lines.filter(size(split(col("value"), "\t", -1)) =!= expected).count()
  }
}
