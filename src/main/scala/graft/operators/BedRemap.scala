package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BED region → gene-symbol remap with the 90%-overlap rule
  * (SURVEY §7.4 hard part 7; reference bed.py:250-350).
  *
  * Each submitted BED region is matched against the known gene
  * positions on its chromosome. Reference semantics:
  *  - if the region overlaps a gene and ≥ `minRatio` (90%) of the
  *    region lies inside the gene's span, remap the region's symbol to
  *    that gene;
  *  - among several qualifying genes pick the max overlap ratio
  *    (pandas `idxmax`, bed.py:301) — made deterministic here by
  *    tie-breaking on (ratio desc, gene start asc, gene symbol asc);
  *  - regions with no qualifying gene keep their submitted symbol but
  *    are marked off-panel (`IN_GENE = false`).
  *
  * Physical shape: gene tables are small (~20k rows) → broadcast range
  * join + one window for the argmax. For a large interval side swap in
  * RangeJoin.binnedOverlap — semantics unchanged.
  */
object BedRemap {

  def remap(bed: DataFrame, genes: DataFrame, minRatio: Double = 0.9): DataFrame = {
    val g = genes.select(
      col("CHROMOSOME"),
      col("START_POSITION").as("GENE_START"),
      col("END_POSITION").as("GENE_END"),
      col("HUGO_SYMBOL").as("GENE_SYMBOL"))

    val joined = bed.join(
      broadcast(g),
      bed("CHROMOSOME") === g("CHROMOSOME") &&
        RangeJoin.overlaps(bed("START_POSITION"), bed("END_POSITION"),
          col("GENE_START"), col("GENE_END")),
      "left")
      .drop(g("CHROMOSOME"))

    val regionLen = col("END_POSITION") - col("START_POSITION") + 1
    val overlapLen = least(col("END_POSITION"), col("GENE_END")) -
      greatest(col("START_POSITION"), col("GENE_START")) + 1
    val ratio = overlapLen.cast("double") / regionLen.cast("double")

    val w = Window
      .partitionBy("CHROMOSOME", "START_POSITION", "END_POSITION", "HUGO_SYMBOL")
      .orderBy(col("__ratio").desc, col("GENE_START").asc_nulls_last,
        col("GENE_SYMBOL").asc_nulls_last)

    joined
      .withColumn("__ratio", when(col("GENE_SYMBOL").isNotNull, ratio))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .withColumn("IN_GENE",
        coalesce(col("__ratio") >= minRatio, lit(false)))
      .withColumn("HUGO_SYMBOL",
        when(col("IN_GENE"), col("GENE_SYMBOL")).otherwise(col("HUGO_SYMBOL")))
      .drop("__ratio", "__rn", "GENE_START", "GENE_END", "GENE_SYMBOL")
  }
}
