package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dashboard statistics (SURVEY §2.5 A2-A4, A8, A10, §2.4 J8;
  * reference dashboard_table_updater.py). Every stat is one
  * aggregation; "+Total" rows come from rollup, crosstabs from pivot
  * with an explicit value list (never inferred at scale).
  */
object Dashboard {

  /** A2: per-center distinct-sample counts with a Total row
    * (dashboard_table_updater.py:127-175).
    */
  def countsPerCenter(df: DataFrame, centerCol: String, idCol: String): DataFrame =
    df.rollup(centerCol)
      .agg(countDistinct(col(idCol)).as("n_samples"))
      .select(coalesce(col(centerCol), lit("Total")).as(centerCol), col("n_samples"))

  /** A3: code × center crosstab with row totals
    * (dashboard_table_updater.py:297-395). `centers` must be explicit.
    */
  def crosstab(df: DataFrame, rowCol: String, colCol: String,
               centers: Seq[String]): DataFrame = {
    val wide = df.groupBy(rowCol).pivot(colCol, centers).count().na.fill(0L, centers)
    wide.withColumn("Total", centers.map(col).reduce(_ + _))
  }

  /** A4: per-column completeness fraction — non-null and not one of the
    * `missingTokens` (dashboard_table_updater.py:16-50).
    */
  def completeness(df: DataFrame, columns: Seq[String],
                   missingTokens: Seq[String] = Seq("", "Not Collected", "Unknown")): DataFrame = {
    val aggs = columns.map { c =>
      round(avg(when(col(c).isNotNull && !col(c).isin(missingTokens: _*), 1.0)
        .otherwise(0.0)), 6).as(c)
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** A10: value_counts compared between two releases; rows whose count
    * decreased (dashboard_table_updater.py:633-672).
    */
  def valueDecreases(current: DataFrame, prior: DataFrame, valueCol: String): DataFrame = {
    val cur = current.groupBy(valueCol).agg(count(lit(1)).as("n_new"))
    val old = prior.groupBy(valueCol).agg(count(lit(1)).as("n_old"))
    cur.join(old, Seq(valueCol), "full_outer")
      .select(col(valueCol),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_old"), lit(0L)).as("n_old"))
      .filter(col("n_new") < col("n_old"))
  }

  /** Wiki-template fn (R/dashboard_template_functions.R:31-44
    * `get_failed_annotation_table_counts`): counts of
    * Annotation_Status=="FAILED" rows by the group columns, sorted by
    * those columns like the R `do.call(order, ...)`.
    */
  def failedAnnotationCounts(maf: DataFrame, groupCols: Seq[String],
                             countsColName: String = "n_failed"): DataFrame =
    maf.filter(col("Annotation_Status") === "FAILED")
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as(countsColName))
      .orderBy(groupCols.map(col): _*)

  /** Wiki-template shape behind plotCenterXRace/Ethnicity/Sex
    * (templates/dashboardTemplate.Rmd:61-158): center × category counts
    * with the within-center percentage.
    */
  def centerCategoryDistribution(df: DataFrame, centerCol: String,
                                 attrCol: String): DataFrame = {
    val counts = df.groupBy(col(centerCol), col(attrCol)).agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(centerCol))
    counts.withColumn("pct", round(col("n") / sum(col("n")).over(w) * 100.0, 4))
  }

  /** Wiki-template release-content table
    * (templates/dashboardTemplate.Rmd:278-295): per-center distinct
    * samples + variant counts full-outer merged, with a Total row.
    */
  def releaseContent(samples: DataFrame, mutations: DataFrame,
                     centerCol: String, idCol: String): DataFrame = {
    val s = samples.groupBy(col(centerCol).as("Center"))
      .agg(countDistinct(col(idCol)).as("Samples"))
    val m = mutations.groupBy(col(centerCol).as("Center"))
      .agg(count(lit(1)).as("Variants"))
    val merged = s.join(m, Seq("Center"), "full_outer")
      .select(col("Center"),
        coalesce(col("Samples"), lit(0L)).as("Samples"),
        coalesce(col("Variants"), lit(0L)).as("Variants"))
    // Per-center rows + Total in ONE pass over `merged` (rollup = single
    // Expand+Aggregate), instead of unioning a second full re-computation.
    merged.rollup(col("Center"))
      .agg(sum("Samples").as("Samples"), sum("Variants").as("Variants"))
      .select(coalesce(col("Center"), lit("Total")).as("Center"),
        col("Samples"), col("Variants"))
  }

  /** J8: sample-count diff between two releases per center
    * (dashboard_table_updater.py:429-461).
    */
  def releaseDiff(current: DataFrame, prior: DataFrame,
                  centerCol: String, idCol: String): DataFrame = {
    val cur = current.groupBy(centerCol).agg(countDistinct(col(idCol)).as("n_cur"))
    val old = prior.groupBy(centerCol).agg(countDistinct(col(idCol)).as("n_prior"))
    cur.join(old, Seq(centerCol), "full_outer")
      .select(col(centerCol),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"),
        coalesce(col("n_prior"), lit(0L)).as("n_prior"),
        (coalesce(col("n_cur"), lit(0L)) - coalesce(col("n_prior"), lit(0L))).as("diff"))
  }
}
