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

  /** Per-key distinct-count sketch of one batch (DataSketches HLL via
    * the native `hll_sketch_agg`). COUNT DISTINCT is NOT a monoid over
    * scalars — yesterday's count plus today's count double-counts
    * returning values, so the plain [[partial]]/[[merge]] path can't
    * maintain it. The SKETCH is the monoid: HLL registers max-merge
    * under union, so folding a delta sketch into the stored sketch
    * yields the same registers as re-sketching base ∪ delta — the
    * delta-sized refresh this module exists for, extended to distinct
    * counts. Merged-sketch estimates are PARTITION-INVARIANT (any split
    * of the facts merges to the same estimate — the composite estimator
    * reads only the registers); note a single-pass un-merged sketch can
    * report a slightly different estimate in dense mode because
    * DataSketches tracks an order-dependent HIP accumulator there, so
    * the maintenance contract compares merged against merged. (No
    * retraction: register max is irreversible — deletions need a
    * rebuild, same as every HLL store.)
    */
  def partialDistinct(batch: DataFrame, keys: Seq[String], valueCol: String,
                      alias: String, lgK: Int = 12): DataFrame =
    batch.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lgK).as(alias))

  /** Merge per-key sketch partials (stored + deltas) into the refreshed
    * sketch table. Keys absent from one side pass through (union of an
    * HLL with nothing is itself).
    */
  def mergeDistinct(partials: Seq[DataFrame], keys: Seq[String],
                    sketchCol: String): DataFrame =
    partials.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(hll_union_agg(col(sketchCol)).as(sketchCol))

  /** Readable estimate column from a sketch column. */
  def estimateDistinct(sketches: DataFrame, sketchCol: String,
                       alias: String): DataFrame =
    sketches.withColumn(alias, hll_sketch_estimate(col(sketchCol)))

  /** Deterministic bottom-k sample maintenance — a mergeable
    * "reservoir": per key, keep the k values with the smallest salted
    * 32-bit hash (value tie-break). The sample is a pure function of
    * the value SET, because bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪
    * bottom-k(B)) — so folding a delta partial into the stored partial
    * is EXACTLY the from-scratch sample (true reservoir sampling is
    * arrival-order-dependent and can't be maintained this way), and
    * the hash uniformity makes it uniform-at-random per key. The
    * maintained artifact: a per-key eval/debug sample that refreshes
    * at delta cost, bounded k rows per key in state and shuffle
    * (map-side-combined [[graft.plans.TopKAggregate]]); SET semantics —
    * duplicate values dedupe before the bottom-k, so re-ingesting a
    * value is a no-op.
    */
  def partialSample(batch: DataFrame, keys: Seq[String], valueCol: String,
                    k: Int, salt: String = "sample"): DataFrame = {
    val h = conv(substring(md5(concat(lit(salt + ":"),
      col(valueCol).cast("string"))), 1, 8), 16, 10).cast("long")
    graft.plans.TopKAggregate.topKExploded(
        batch.select((keys.map(col) :+ col(valueCol).cast("long").as("__v"))
          :+ h.as("__h"): _*).distinct(),
        keys, col("__h"), col("__v"), k, descending = false)
      .select((keys.map(col) :+ col("id").as(valueCol))
        :+ col("score").cast("long").as("__h"): _*)
  }

  /** Row-identity variant of [[partialSample]] for maintained order
    * STATISTICS (quantiles over row multiplicity, not distinct
    * values): the hash ranges over the row-identity columns, so each
    * physical row is its own sampling unit and the carried member is
    * the measure value. Same exact-merge property — the maintained
    * sample is a pure function of the row-identity set — so a
    * quantile read from it is split-invariant, and its accuracy is
    * the usual uniform-sample bound (rank error ~ 1/√k).
    */
  def partialRowSample(batch: DataFrame, keys: Seq[String], valueCol: String,
                       identityCols: Seq[String], k: Int,
                       salt: String = "rows"): DataFrame = {
    val h = conv(substring(md5(concat_ws("|",
      lit(salt) +: identityCols.map(c => col(c).cast("string")): _*)), 1, 8),
      16, 10).cast("long")
    graft.plans.TopKAggregate.topKExploded(
        batch.select((keys.map(col) :+ col(valueCol).cast("long").as("__v"))
          :+ h.as("__h"): _*).distinct(),
        keys, col("__h"), col("__v"), k, descending = false)
      .select((keys.map(col) :+ col("id").as(valueCol))
        :+ col("score").cast("long").as("__h"): _*)
  }

  /** Merge sample partials (stored + deltas): union, re-take bottom-k.
    * Output shape equals [[partialSample]] — (keys, value, hash).
    */
  def mergeSamples(partials: Seq[DataFrame], keys: Seq[String],
                   valueCol: String, k: Int): DataFrame =
    graft.plans.TopKAggregate.topKExploded(
        partials.reduce(_ unionByName _)
          .select((keys.map(col) :+ col(valueCol).as("__v")) :+ col("__h"): _*)
          .distinct(),
        keys, col("__h"), col("__v"), k, descending = false)
      .select((keys.map(col) :+ col("id").as(valueCol))
        :+ col("score").cast("long").as("__h"): _*)
}
