package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Genomic-style interval joins (SURVEY §2.4 J6; reference analogs:
  * R/MAFinBED.R:157 `%over%`, database_to_staging.py:271-274 pyranges
  * intersect, bed.py:250-350 overlap remap).
  *
  * Two physical shapes, chosen by the caller:
  *
  *  1. `broadcastOverlap` — the interval side is small (gene panels /
  *     BED files are thousands of rows): broadcast non-equi join. Planner
  *     gives BroadcastNestedLoop, which is fine at that size.
  *
  *  2. `binnedOverlap` — both sides large (the 100 TB path): map every
  *     interval/point to fixed-width bins, equi-join on (chrom, bin) so
  *     it is a plain shuffle-hash/sort-merge join, then apply the exact
  *     overlap predicate and drop bin-induced duplicates. This is the
  *     standard "genomic binning" rewrite; shuffle volume is linear in
  *     input + interval-width/bin ratio, never O(n·m).
  */
object RangeJoin {

  /** point/interval overlap predicate: [s1,e1] ∩ [s2,e2] ≠ ∅.
    * Built as the [[graft.plans.RangeOverlap]] marker: evaluates (and
    * codegens) as the plain conjunction, but lets the injected
    * BinnedIntervalJoinRule auto-rewrite large×large joins carrying it.
    */
  def overlaps(s1: Column, e1: Column, s2: Column, e2: Column): Column =
    graft.plans.RangeOverlap(s1, e1, s2, e2)

  /** Small interval side: broadcast non-equi join.
    * Column names must be disjoint apart from `chrom`.
    */
  def broadcastOverlap(big: DataFrame, small: DataFrame, chrom: String,
                       bigStart: String, bigEnd: String,
                       smallStart: String, smallEnd: String): DataFrame =
    big.join(
      broadcast(small),
      big(chrom) === small(chrom) &&
        overlaps(big(bigStart), big(bigEnd), small(smallStart), small(smallEnd))
    ).drop(small(chrom))

  /** Large×large interval join via binning.
    * Each side explodes to ceil(width/binSize) rows keyed by
    * (chrom, bin); the equi-join then carries the exact predicate.
    * Bin-induced duplicate pairs are eliminated WITHOUT a distinct
    * shuffle: a pair is kept only in the canonical bin where its
    * overlap starts (`bin == floor(max(starts)/binSize)`), so no
    * unique row key is required and no extra pass happens.
    */
  def binnedOverlap(left: DataFrame, right: DataFrame, chrom: String,
                    leftStart: String, leftEnd: String,
                    rightStart: String, rightEnd: String,
                    binSize: Long): DataFrame = {
    def binned(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn("__bin",
        explode(sequence(floor(col(s) / binSize), floor(col(e) / binSize))))
    val l = binned(left, leftStart, leftEnd)
    val r = binned(right, rightStart, rightEnd)
    l.join(r, Seq(chrom, "__bin"))
      .filter(overlaps(col(leftStart), col(leftEnd), col(rightStart), col(rightEnd)))
      .filter(col("__bin") === floor(greatest(col(leftStart), col(rightStart)) / binSize))
      .drop("__bin")
  }

  /** Containment variant (whitelist semantics, F2): left point/interval
    * fully inside right interval.
    */
  def contained(s1: Column, e1: Column, s2: Column, e2: Column): Column =
    s1 >= s2 && e1 <= e2

  /** Adaptive strategy pick: broadcast the interval side when Catalyst
    * estimates it under `broadcastThreshold` bytes (panel-sized BED
    * files), otherwise the binned equi-join (both sides large). This is
    * the planner-level choice SURVEY §4 describes, made with the same
    * statistics Catalyst's own join selection uses.
    */
  def overlapAuto(big: DataFrame, intervals: DataFrame, chrom: String,
                  bigStart: String, bigEnd: String,
                  intervalStart: String, intervalEnd: String,
                  binSize: Long = 1 << 16,
                  broadcastThreshold: Long = 8L << 20): DataFrame = {
    val estimated = intervals.queryExecution.optimizedPlan.stats.sizeInBytes
    if (estimated <= broadcastThreshold)
      broadcastOverlap(big, intervals, chrom, bigStart, bigEnd, intervalStart, intervalEnd)
    else
      binnedOverlap(big, intervals, chrom, bigStart, bigEnd, intervalStart, intervalEnd, binSize)
  }
}
