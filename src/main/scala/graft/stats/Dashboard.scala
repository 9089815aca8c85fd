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
