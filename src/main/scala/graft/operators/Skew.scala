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

  /** Two-stage salted aggregation: groupBy (keys + salt) with partial
    * aggregates, then re-aggregate without the salt. Turns one reducer
    * per hot key into `salts` reducers. `partials` maps each output
    * column to (partialAgg, finalAgg-from-partial) — e.g. count→sum.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
                partials: Seq[(String, Column, Column => Column)]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
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
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    val bigSalted = big.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)).cast("int"))
    val smallReplicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigSalted.join(smallReplicated, Seq(key, "__salt")).drop("__salt")
  }
}
