package graft.release

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Consortium → public release conversion (SURVEY §2.3 F12-F13;
  * reference consortium_to_public.py:41-359).
  *
  * The clinical-tier scope table says, per column, whether it is
  * releasable publicly (conftest.py:52-66 shape:
  * fieldName / patient / sample / public). Conversion =
  *  1. compute the public sample set (release-date cutoff);
  *  2. project clinical to public-scope columns only;
  *  3. semi-join every genomic artifact to the public samples;
  *  4. FILTER column forced to "PASS"; common_variant rows dropped.
  */
object PublicRelease {

  final case class Scope(fieldName: String, public: Boolean)

  /** Column projection by scope config — unknown columns stay private. */
  def scopeColumns(df: DataFrame, scope: Seq[Scope]): DataFrame = {
    val publicCols = scope.filter(_.public).map(_.fieldName)
      .filter(df.columns.contains)
    df.select(publicCols.map(col): _*)
  }

  /** Public sample set: samples whose sequencing date is at least
    * `monthsOld` months before `asOf` (consortium_to_public.py:47 —
    * 365-day default cutoff). Clinical tables without a SEQ_DATE
    * ("MMM-yyyy" strings, C5) release everything, matching the
    * reference path where the seq-date filter was removed.
    */
  def publicSamples(clinical: DataFrame, monthsOld: Int = 12,
                    asOf: String = "2026-01-01"): DataFrame = {
    val base =
      if (!clinical.columns.contains("SEQ_DATE")) clinical
      else clinical.filter(
        months_between(lit(asOf).cast("date"),
          to_date(col("SEQ_DATE"), "MMM-yyyy")) >= monthsOld)
    base.select("SAMPLE_ID").distinct()
  }

  def convert(clinical: DataFrame, maf: DataFrame, scope: Seq[Scope],
              monthsOld: Int = 12, asOf: String = "2026-01-01"): (DataFrame, DataFrame) = {
    val keep = publicSamples(clinical, monthsOld, asOf)
    val pubClinical = scopeColumns(
      clinical.join(broadcast(keep), Seq("SAMPLE_ID"), "left_semi"), scope)
    val pubMaf0 = maf.join(
      broadcast(keep.withColumnRenamed("SAMPLE_ID", "TUMOR_SAMPLE_BARCODE")),
      Seq("TUMOR_SAMPLE_BARCODE"), "left_semi")
    // F13 + FILTER=PASS overwrite (consortium_to_public.py:272-289)
    val pubMaf =
      if (pubMaf0.columns.contains("FILTER"))
        Filters.dropCommonVariants(pubMaf0, "FILTER").withColumn("FILTER", lit("PASS"))
      else pubMaf0
    (pubClinical, pubMaf)
  }
}
