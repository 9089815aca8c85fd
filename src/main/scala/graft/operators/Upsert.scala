package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Primary-key table upsert (SURVEY §2.1 S12; reference:
  * load.py:129-347 `update_table`/`check_database_changes`,
  * process_functions.py:445-629 append/update/delete row diffing).
  *
  * Semantics reproduced:
  *  - PK is the space-joined concatenation of the key columns
  *    (load.py:229-252);
  *  - rows in `incoming` with a PK absent from `existing`  → append;
  *  - rows present in both but differing on any compared column → update;
  *  - rows only in `existing` → delete (when `allowDelete`).
  *
  * Physical shape: a single full-outer shuffle join on the PK. At
  * cluster scale both sides hash-partition on the PK; writing the merged
  * result back is a full-partition overwrite (Hive-style) — the same
  * pattern Delta's MERGE INTO compiles to without the transaction log.
  */
object Upsert {

  /** The three classified row sets, views over one cached full-outer
    * join. Call [[Diff.unpersist]] once the sets have been consumed —
    * long-running drivers looping over tables otherwise accumulate
    * cached classifications.
    */
  final case class Diff(appends: DataFrame, updates: DataFrame, deletes: DataFrame,
                        private val cached: Option[DataFrame] = None) {
    def unpersist(): Unit = cached.foreach(_.unpersist())
  }

  def pkCol(pkCols: Seq[String]): org.apache.spark.sql.Column =
    concat_ws(" ", pkCols.map(c => coalesce(col(c).cast("string"), lit(""))): _*)

  /** Classify incoming vs existing rows into append/update/delete sets.
    * `compareCols` defaults to all shared non-PK columns.
    *
    * ONE full-outer shuffle join classifies every row; the three result
    * frames are filters over that shared (cached) classification, so at
    * scale the diff costs one exchange per side instead of three joins.
    */
  /** Unpersisted classification plan: one full-outer join on the PK
    * tuple, every row tagged `__kind` ∈ {append, update, delete, same}.
    */
  def classify(incoming: DataFrame, existing: DataFrame, pkCols: Seq[String],
               compareCols: Seq[String] = Nil, nullSafeKeys: Boolean = true): DataFrame = {
    val cmp = if (compareCols.nonEmpty) compareCols
    else incoming.columns.intersect(existing.columns).filterNot(pkCols.contains).toSeq

    // explicit aliases: both sides may derive from the same base table
    // (classic self-join ambiguity otherwise). Join on the key TUPLE
    // with null-safe equality — faster than a concat-string key (no 6M
    // string materializations) and collision-free ("a b"+"c" vs
    // "a"+"b c" collide under space-joining).
    //
    // nullSafeKeys=false swaps <=> for = : required for the bucketed
    // existing-side fast path, because Spark hashes a null-safe key as
    // (coalesce(k, 0), isnull(k)) — expressions a bucketed scan's
    // HashPartitioning(k) can never satisfy, so the planner disables
    // the bucket join. With plain =, a NULL in a PK column matches
    // nothing (that row classifies as append + delete instead of
    // same/update) — callers using the fast path must guarantee
    // non-null PKs, which real primary keys are.
    val in  = incoming.withColumn("__present", lit(true)).alias("__l")
    val ex  = existing.withColumn("__present", lit(true)).alias("__r")

    val keyEq: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column =
      if (nullSafeKeys) _ <=> _ else _ === _
    val keyMatch = pkCols.map(c => keyEq(col(s"__l.$c"), col(s"__r.$c"))).reduce(_ && _)
    val changed = cmp.map(c => !(col(s"__l.$c") <=> col(s"__r.$c")))
      .reduceOption(_ || _).getOrElse(lit(false))

    in.join(ex, keyMatch, "full_outer")
      .withColumn("__kind",
        when(col("__r.__present").isNull, lit("append"))
          .when(col("__l.__present").isNull, lit("delete"))
          .when(changed, lit("update"))
          .otherwise(lit("same")))
  }

  /** Append/update/delete counts in ONE pass: conditional aggregation
    * over the classification, unpivoted with `stack` so all three kinds
    * appear even at zero. One scan + one exchange per side — the
    * dashboard/monitoring shape (vs. three filter+agg branches that
    * re-scan the join).
    */
  def kindCounts(incoming: DataFrame, existing: DataFrame, pkCols: Seq[String],
                 compareCols: Seq[String] = Nil, nullSafeKeys: Boolean = true): DataFrame =
    classify(incoming, existing, pkCols, compareCols, nullSafeKeys)
      .agg(
        coalesce(sum(when(col("__kind") === "append", 1L).otherwise(0L)), lit(0L)).as("__a"),
        coalesce(sum(when(col("__kind") === "update", 1L).otherwise(0L)), lit(0L)).as("__u"),
        coalesce(sum(when(col("__kind") === "delete", 1L).otherwise(0L)), lit(0L)).as("__d"))
      .selectExpr("stack(3, 'append', __a, 'update', __u, 'delete', __d) as (kind, n)")

  def diff(incoming: DataFrame, existing: DataFrame, pkCols: Seq[String],
           compareCols: Seq[String] = Nil, nullSafeKeys: Boolean = true): Diff = {
    val classified = classify(incoming, existing, pkCols, compareCols, nullSafeKeys).persist()

    def side(kind: String, alias: String, cols: Array[String]) =
      classified.filter(col("__kind") === kind)
        .select(cols.toIndexedSeq.map(c => col(s"$alias.$c")): _*)

    Diff(
      appends = side("append", "__l", incoming.columns),
      updates = side("update", "__l", incoming.columns),
      deletes = side("delete", "__r", existing.columns),
      cached = Some(classified))
  }

  /** Stage the EXISTING side as a bucketed, PK-sorted managed table and
    * return a frame reading it. Every subsequent [[classify]]/[[diff]]/
    * [[kindCounts]] against the returned frame plans the existing side
    * exchange-free: the scan reports `HashPartitioning(pkCols, buckets)`
    * (the FULL tuple — Spark's co-partition check rejects prefixes),
    * which satisfies the PK join's distribution, so only the
    * (delta-sized) incoming side shuffles. Use `nullSafeKeys = false` on
    * the diff calls — see [[classify]]. This is the operational
    * default at scale — the upserted table is ALREADY stored bucketed
    * from the previous merge, so the nightly diff never re-shuffles the
    * 100 TB side (reference merge loop: load.py:255-296 re-reads the
    * database table on every update cycle).
    */
  def stageBucketed(existing: DataFrame, table: String, pkCols: Seq[String],
                    buckets: Int): DataFrame = {
    val spark = existing.sparkSession
    // a location left behind by a PREVIOUS session (table gone from this
    // catalog, directory still on disk) fails saveAsTable even with
    // overwrite — drop the table and clear the orphan first
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.conf.warehousePath, table.toLowerCase(java.util.Locale.ROOT))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    graft.core.Bucketing.writeBucketed(existing, table, pkCols, pkCols, buckets)
    spark.table(table)
  }

  /** Apply the upsert: every incoming row wins on its PK; existing rows
    * with no incoming match are deleted (allowDelete) or kept. Persisting
    * the result is a partition overwrite at the storage layer.
    * `nullSafeKeys = false` enables the bucketed existing-side fast path
    * for the keep-join too (same rule as [[classify]]): against a
    * [[stageBucketed]] table the anti-join's existing side scans with no
    * exchange — only the delta shuffles.
    */
  def merge(incoming: DataFrame, existing: DataFrame, pkCols: Seq[String],
            allowDelete: Boolean = true, nullSafeKeys: Boolean = true): DataFrame =
    if (allowDelete) incoming
    else {
      val keyEq: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column =
        if (nullSafeKeys) _ <=> _ else _ === _
      val kept = existing.alias("__r")
        .join(incoming.alias("__l"),
          pkCols.map(c => keyEq(col(s"__l.$c"), col(s"__r.$c"))).reduce(_ && _),
          "left_anti")
      incoming.unionByName(kept.select(incoming.columns.toIndexedSeq.map(col): _*))
    }

  /** Write a merged table back as parquet (full overwrite). */
  def overwrite(spark: SparkSession, df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)
}
