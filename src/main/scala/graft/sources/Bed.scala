package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** BED reader (SURVEY §2.1 S5; reference bed.py:403-429).
  *
  * Headerless 5-6 column TSV: chrom, start, end, symbol, includeInPanel
  * [, clinicalReport]. The reference rejects files whose first row
  * smells like a header (first value not digit/chr/X/Y).
  */
object Bed {

  val schema: StructType = StructType(Seq(
    StructField("CHROMOSOME", StringType),
    StructField("START_POSITION", LongType),
    StructField("END_POSITION", LongType),
    StructField("HUGO_SYMBOL", StringType),
    StructField("INCLUDE_IN_PANEL", BooleanType),
    StructField("CLINICAL_REPORT", BooleanType)))

  /** S5: read; throws on header smell (bed.py:420-427). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read
      .option("sep", "\t")
      .option("header", "false")
      .option("nullValue", "")
      .csv(path)
    val first = raw.limit(1).collect().headOption.map(_.getString(0)).getOrElse("")
    val ok = first.matches("^(chr)?([0-9]+|X|Y|MT).*") || first.forall(_.isDigit)
    if (!ok) throw new IllegalArgumentException(
      s"$path: first BED value '$first' looks like a header — BED files are headerless")
    val named = raw.toDF(schema.fieldNames.take(raw.columns.length).toIndexedSeq: _*)
    named
      .withColumn("CHROMOSOME", regexp_replace(col("CHROMOSOME"), "^chr", ""))
      .withColumn("START_POSITION", col("START_POSITION").cast(LongType))
      .withColumn("END_POSITION", col("END_POSITION").cast(LongType))
      .withColumn("INCLUDE_IN_PANEL",
        if (named.columns.contains("INCLUDE_IN_PANEL"))
          col("INCLUDE_IN_PANEL").cast(BooleanType) else lit(true))
  }

  /** Gene-symbol cleanup: split-take-first on `;_:.` separators
    * (bed.py:542-545, SURVEY C3).
    */
  def cleanSymbol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    split(c, "[;_:.]").getItem(0)

  /** S15: distinct panel genes (exon + included) as a small DataFrame
    * for the gene-panel text sink (bed.py:444-497).
    */
  def panelGenes(bed: DataFrame): DataFrame =
    bed.filter(col("INCLUDE_IN_PANEL") === true)
      .select(cleanSymbol(col("HUGO_SYMBOL")).as("HUGO_SYMBOL"))
      .distinct()
      .orderBy("HUGO_SYMBOL")
}
