package graft.release

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Release-stage filters (SURVEY §2.3 F1-F14) as pure column/DataFrame
  * transforms. Every reference filter that shelled out to R or pandas
  * loops becomes a declarative plan Catalyst can push down and reorder.
  */
object Filters {

  /** F1: germline filter — drop when the row-wise max of the population
    * allele-frequency columns exceeds `threshold`, unless whitelisted
    * (database_to_staging.py:296-403). `greatest` is the A11 analog.
    */
  def germlineKeep(afCols: Seq[Column], threshold: Double, whitelisted: Column): Column = {
    val maxAf = afCols match {
      case Nil      => lit(0.0)
      case Seq(one) => one
      case many     => greatest(many: _*)
    }
    whitelisted || coalesce(maxAf, lit(0.0)) <= threshold
  }

  /** F7: PHI redaction — sentinel remap + >89-year redaction
    * (database_to_staging.py:109-233).
    */
  def redactAge(intervalDays: Column, over89Sentinel: String = "cannotReleaseHIPAA",
                underSentinel: String = "withheld"): Column =
    when(intervalDays.isNull, lit(null).cast("string"))
      .when(intervalDays.startsWith(">"), lit(over89Sentinel))
      .when(intervalDays.startsWith("<"), lit(underSentinel))
      .otherwise(intervalDays)

  /** F8: AGE day→year conversion with sentinel remap
    * (database_to_staging.py:1290-1300): >32485→>89, <6570→<18,
    * else floor(days/365.25).
    */
  def daysToYears(c: Column): Column =
    when(c === ">32485", lit(">89"))
      .when(c === "<6570", lit("<18"))
      .when(c.rlike("^-?\\d+$"), floor(c.cast("double") / 365.25).cast("string"))
      .otherwise(c)

  /** F9 (process_functions.py:327-353 `seqDateFilter`): SAMPLE_IDs whose
    * SEQ_DATE ("MMM-yyyy") falls within `days` of the processing date;
    * the "Release" sentinel maps to Jan-1900 (always outside any
    * release window, exactly the reference's rewrite).
    */
  def seqDateKeepSamples(clinical: DataFrame, processingDate: String, days: Int): DataFrame = {
    val date = to_date(
      when(col("SEQ_DATE") === "Release", lit("Jan-1900")).otherwise(col("SEQ_DATE")),
      "MMM-yyyy")
    clinical
      .filter(datediff(to_date(lit(processingDate), "MMM-yyyy"), date) <= days)
      .select("SAMPLE_ID")
  }

  /** F10: sample-keep propagation — subset any artifact to the keep list
    * via a semi-join (database_to_staging.py:237-250). The keep list is
    * small relative to variant tables → broadcast semi-join, no shuffle
    * of the big side.
    */
  def keepSamples(df: DataFrame, keep: DataFrame, idCol: String): DataFrame =
    df.join(broadcast(keep.select(idCol).distinct()), Seq(idCol), "left_semi")

  /** F11: retraction — anti-join delete (toRetract.py:37-90). */
  def retract(df: DataFrame, retracted: DataFrame, idCol: String): DataFrame =
    df.join(broadcast(retracted.select(idCol).distinct()), Seq(idCol), "left_anti")

  /** F13: drop common variants (consortium_to_public.py:27-37). */
  def dropCommonVariants(df: DataFrame, filterCol: String): DataFrame =
    df.filter(!coalesce(col(filterCol).contains("common_variant"), lit(false)))

  /** F14: drop germline-status rows (database_to_staging.py:862-881).
    * The column NAME is searched case-insensitively (release files have
    * no column-name validation) but the VALUE compare is exact
    * `!= "GERMLINE"` like the reference; null status rows are kept
    * (pandas NaN != "GERMLINE" is True). No matching column → no-op.
    */
  def dropGermline(df: DataFrame, statusCol: String): DataFrame =
    df.columns.find(_.equalsIgnoreCase(statusCol)) match {
      case Some(c) => df.filter(coalesce(col(c) =!= "GERMLINE", lit(true)))
      case None    => df
    }
}
