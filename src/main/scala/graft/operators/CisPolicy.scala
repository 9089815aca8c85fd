package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mutation-in-cis flag lifecycle (SURVEY §7.4 hard part 6; reference
  * R/mergecheck_functions.R:47-76 + database_to_staging.py:591-761).
  *
  * Newly detected in-cis variant pairs are reconciled against the
  * persisted review table:
  *  - new pair, never seen           → FLAG  (needs center review)
  *  - seen, center said KEEP/FIXED   → keep that decision
  *  - seen, center said TOSS         → TOSS  (sample dropped at release)
  *  - previously flagged, no longer detected (data fixed) → FIXED
  *
  * Pure PK reconciliation — one full-outer join on the variant-pair
  * key, exactly the Upsert diff shape, so it scales like any PK merge.
  */
object CisPolicy {

  val Flag  = "FLAG"
  val Keep  = "KEEP"
  val Toss  = "TOSS"
  val Fixed = "FIXED"

  /** `detected`: current run's flagged pairs with `pair_key`.
    * `reviewTable`: persisted (pair_key, status) decisions.
    * Returns the new review-table contents.
    */
  def reconcile(detected: DataFrame, reviewTable: DataFrame): DataFrame = {
    val d = detected.select(col("pair_key")).distinct()
      .withColumn("__detected", lit(true))
    val r = reviewTable.select(col("pair_key"), col("status"))
    d.join(r, Seq("pair_key"), "full_outer")
      .select(
        col("pair_key"),
        when(col("__detected").isNotNull && col("status").isNull, lit(Flag))          // new
          .when(col("__detected").isNotNull, col("status"))                            // seen: sticky
          .when(col("status").isin(Flag, Toss), lit(Fixed))                            // gone: resolved
          .otherwise(col("status"))                                                    // gone: keep decision
          .as("status"))
  }

  /** Samples to drop at release: any sample owning a TOSS'd pair. */
  def tossSamples(review: DataFrame, sampleOfPair: DataFrame): DataFrame =
    review.filter(col("status") === Toss)
      .join(sampleOfPair, Seq("pair_key"))
      .select("TUMOR_SAMPLE_BARCODE").distinct()
}
