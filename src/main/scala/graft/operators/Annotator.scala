package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** External annotation seam (SURVEY §2.11; reference: the Genome Nexus
  * bash+Java subprocess, process_mutation.py:408-420, plus bedtools and
  * the cBioPortal validator).
  *
  * The reference shells out on the driver; at 100 TB the annotation has
  * to run WHERE THE DATA IS. Contract: an [[Annotator]] maps a variant
  * DataFrame to an annotated one. Two implementations:
  *
  *  - [[PassthroughAnnotator]]: identity + static columns — the test
  *    double (the reference's own tests mock the subprocess the same way);
  *  - [[PipeAnnotator]]: per-partition `RDD.pipe` of TSV lines through
  *    an external command (one process per partition, streaming both
  *    directions — the Spark-native replacement for the driver-side
  *    subprocess).
  */
trait Annotator {
  def annotate(df: DataFrame): DataFrame
}

/** Identity annotation with optional constant columns (e.g.
  * Annotation_Status=SUCCESS like a successful Genome Nexus run).
  */
final class PassthroughAnnotator(constants: Map[String, String] = Map.empty) extends Annotator {
  override def annotate(df: DataFrame): DataFrame =
    constants.foldLeft(df) { case (d, (k, v)) =>
      d.withColumn(k, org.apache.spark.sql.functions.lit(v))
    }
}

/** Pipe each partition's rows as TSV through `command`; the command
  * must echo one TSV line per input line with `outputColumns` fields.
  */
final class PipeAnnotator(command: Seq[String], outputColumns: Seq[String]) extends Annotator {

  override def annotate(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    // copy fields into locals so closures don't capture `this`
    val inCols = df.columns
    val outCols = outputColumns
    val nOut = outputColumns.length
    val piped = df.rdd
      .map(row => inCols.map(c => Option(row.getAs[Any](c)).map(_.toString).getOrElse("")).mkString("\t"))
      .pipe(command)
      .map { line =>
        val parts = line.split("\t", -1)
        Row.fromSeq(parts.padTo(nOut, "").take(nOut).toSeq)
      }
    spark.createDataFrame(piped,
      StructType(outCols.map(c => StructField(c, StringType))))
  }
}
