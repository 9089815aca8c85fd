package graft.rules

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-file validation (SURVEY §2.2 P24-P26; reference
  * validate.py:308-368 `check_values_between_two_df`,
  * clinical.py:1335-1434, maf.py:429-467, mutationsInCis.py:50-110).
  *
  * Every check is a left-anti join after the reference's
  * case/underscore normalization (`standardize_string_for_validation`
  * validate.py:401-423); the smaller side broadcasts.
  */
object CrossFileChecks {

  /** validate.py:401-423: uppercase + strip + `_`→`-` — values from two
    * files compare after this normalization.
    */
  def standardize(c: Column): Column =
    regexp_replace(upper(trim(c)), "_", "-")

  /** Values of `leftCol` in `left` that never appear in `right.rightCol`
    * (normalized). P24's shape; empty result ⇒ check passes.
    */
  def missingFrom(left: DataFrame, leftCol: String,
                  right: DataFrame, rightCol: String): DataFrame = {
    val l = left.select(standardize(col(leftCol)).as("__v")).where(col("__v").isNotNull).distinct()
    val r = right.select(standardize(col(rightCol)).as("__v")).where(col("__v").isNotNull).distinct()
    l.join(broadcast(r), Seq("__v"), "left_anti").select(col("__v").as(leftCol))
  }

  /** P24a: clinical SEQ_ASSAY_ID ⊆ assay file. */
  def clinicalAssayIds(clinicalSample: DataFrame, assay: DataFrame): DataFrame =
    missingFrom(clinicalSample, "SEQ_ASSAY_ID", assay, "SEQ_ASSAY_ID")

  /** P24c: MAF TUMOR_SAMPLE_BARCODE ⊆ clinical SAMPLE_ID. */
  def mafSampleIds(maf: DataFrame, clinicalSample: DataFrame): DataFrame =
    missingFrom(maf, "TUMOR_SAMPLE_BARCODE", clinicalSample, "SAMPLE_ID")

  /** P26: resubmitted mutationsInCis rows must already exist in the DB
    * (space-joined 5-column primary key in the reference's order,
    * mutationsInCis.py:76-101).
    */
  def unknownCisVariants(resubmission: DataFrame, db: DataFrame): DataFrame = {
    val keyCols = Seq("Tumor_Sample_Barcode", "HGVSp_Short", "Start_Position",
      "Reference_Allele", "Tumor_Seq_Allele2")
    def keyed(df: DataFrame) = df.select(
      concat_ws(" ", keyCols.map(c => coalesce(col(c).cast("string"), lit(""))): _*).as("__key"))
    keyed(resubmission).distinct()
      .join(broadcast(keyed(db).distinct()), Seq("__key"), "left_anti")
      .select(col("__key").as("variant_key"))
  }
}
