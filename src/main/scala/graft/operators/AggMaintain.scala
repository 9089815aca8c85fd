package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of a materialized SUM/COUNT aggregate: fold
  * a delta into the aggregate table without rescanning the base facts.
  *
  * The reference recomputes its dashboard statistics from scratch per
  * release (dashboard_template_functions.R); at 100 TB a daily delta is
  * millions of rows while the base is billions — re-aggregating only
  * the delta and merging partials turns a full-table scan into a
  * delta-sized job plus an aggregate-table-sized merge.
  *
  * Works because SUM and COUNT are commutative monoids: the merged
  * table is `groupBy(keys).sum` over the union of partials. COUNT rides
  * along as a SUM over the partial counts. Deletes/corrections are
  * negative deltas (pass retracted rows with negated measures).
  *
  * Physical shape: `partial(delta)` shuffles only the delta;
  * `merge` shuffles only two aggregate-sized tables. The base fact
  * table is never touched.
  */
object AggMaintain {

  /** Partial aggregate of one batch: per-key COUNT + decimal SUMs.
    * `sumCols` maps measure column → output alias. Sums are kept as
    * decimal(30,4) so partial/merge order can never change the result.
    */
  def partial(batch: DataFrame, keys: Seq[String],
              sumCols: Map[String, String], cntAlias: String): DataFrame = {
    val aggs = sum(lit(1L)).as(cntAlias) +:
      sumCols.toSeq.sortBy(_._2).map { case (c, alias) =>
        sum(col(c).cast("decimal(30,4)")).as(alias)
      }
    batch.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge partial aggregates (the stored table plus one or more delta
    * partials) into the refreshed aggregate. Decimal sums stay exact
    * under any merge order; keys absent from one side contribute 0.
    */
  def merge(partials: Seq[DataFrame], keys: Seq[String],
            valCols: Seq[String]): DataFrame = {
    val unioned = partials.reduce(_ unionByName _)
    unioned.groupBy(keys.map(col): _*)
      .agg(sum(col(valCols.head)).as(valCols.head),
        valCols.tail.map(c => sum(col(c)).as(c)): _*)
  }
}
