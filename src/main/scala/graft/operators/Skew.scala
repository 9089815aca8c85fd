package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities for the 100 TB path.
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; these
  * helpers cover the two places AQE does not: hot-key aggregations and
  * broadcast-ineligible hot-key joins.
  */
object Skew {

  /** Deterministic per-row salt: a content hash of every hashable
    * column, NOT spark_partition_id/monotonically_increasing_id. Those
    * depend on partition layout and intra-partition order, which are
    * not stable across stage RETRY — a retried map task would re-salt
    * rows differently and reducers could fetch duplicated/dropped rows
    * (the SPARK-23207 failure class). A content hash re-evaluates
    * identically on recomputation.
    *
    * Map-typed columns are excluded (xxhash64 cannot hash maps — the
    * whole frame would fail analysis for one such column); everything
    * else participates.
    */
  private def containsMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case _: org.apache.spark.sql.types.MapType => true
    case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => containsMap(f.dataType))
    case a: org.apache.spark.sql.types.ArrayType => containsMap(a.elementType)
    case _ => false
  }

  private def rowSalt(df: DataFrame, salts: Int): Column = {
    val hashable = df.schema.fields.toIndexedSeq
      .filterNot(f => containsMap(f.dataType))
      .map(f => col(f.name))
    if (hashable.isEmpty) lit(0) // nothing hashable: degenerate, unsalted
    else pmod(xxhash64(hashable: _*), lit(salts)).cast("int")
  }

  /** Two-stage salted aggregation: groupBy (keys + salt) with partial
    * aggregates, then re-aggregate without the salt. Turns one reducer
    * per hot key into `salts` reducers. `partials` maps each output
    * column to (partialAgg, finalAgg-from-partial) — e.g. count→sum.
    *
    * PRECONDITION (holds for all in-repo callers — CC edges, LSH band
    * keys): rows within a hot key must be (mostly) DISTINCT. The salt
    * is a content hash, so exact-duplicate rows land on ONE salt and a
    * hot key made of value-identical rows (e.g. counting duplicate
    * rows) regains its single reducer. For that shape, pre-reduce the
    * duplicates first — `df.groupBy(all columns).count()` is itself a
    * map-side-combining aggregate that a hot key cannot skew — then
    * salt the (distinct-row, weight) result.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
                partials: Seq[(String, Column, Column => Column)]): DataFrame = {
    val salted = df.withColumn("__salt", rowSalt(df, salts))
    val stage1 = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head._2.as(s"__p_${partials.head._1}"),
        partials.tail.map(p => p._2.as(s"__p_${p._1}")): _*)
    stage1.groupBy(keys.map(col): _*)
      .agg(partials.head._3(col(s"__p_${partials.head._1}")).as(partials.head._1),
        partials.tail.map(p => p._3(col(s"__p_${p._1}")).as(p._1)): _*)
  }

  /** Salted hot-key join: replicate the small side `salts`× with a salt
    * column, salt the big side per-row, equi-join on (key, salt). For
    * when the small side is too big to broadcast but keys are skewed.
    * Same distinct-rows precondition as [[saltedAgg]]: exact-duplicate
    * big-side rows share one salt (correct, but unprotected).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    val bigSalted = big.withColumn("__salt", rowSalt(big, salts))
    val smallReplicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigSalted.join(smallReplicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Salted join that pays the salt tax ONLY on hot keys. `small` must
    * carry `countCol` = the big-side multiplicity of its key (callers
    * that build `small` with a groupBy get it for free from the same
    * aggregate). Keys at or above `hotThreshold` are the hot set — by
    * pigeonhole it holds at most Σcount/hotThreshold keys, so it
    * BROADCASTS — and only their big-side rows get a random salt in
    * [0, salts); everything else joins on salt 0 with zero small-side
    * replication. On uniform data this degenerates to a plain shuffle
    * join (empty broadcast, no replication); under a zipf hub the hub's
    * rows fan out across `salts` reducer keys deterministically. Same
    * result set as [[saltedJoin]] / a plain inner join on `key`.
    */
  def saltedJoinHotOnly(big: DataFrame, small: DataFrame, key: String,
                        countCol: String, salts: Int,
                        hotThreshold: Long): DataFrame = {
    val hot = small.filter(col(countCol) >= hotThreshold)
      .select(col(key)).withColumn("__hot", lit(true))
    val bigSalted = big.join(broadcast(hot), Seq(key), "left")
      .withColumn("__salt",
        when(col("__hot"), rowSalt(big, salts)).otherwise(lit(0)).cast("int"))
      .drop("__hot")
    val smallSalted = small
      .withColumn("__salt", explode(
        when(col(countCol) >= hotThreshold, sequence(lit(0), lit(salts - 1)))
          .otherwise(sequence(lit(0), lit(0)))))
      .drop(countCol)
    bigSalted.join(smallSalted, Seq(key, "__salt")).drop("__salt")
  }
}
