package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Assay-information YAML reader (SURVEY §2.1 S6; reference
  * assay.py:79-129, process_functions.py:90-149).
  *
  * YAML shape: top-level map of SEQ_ASSAY_ID → pipeline fields, each
  * holding an `assay_specific_info` list of per-assay maps. The
  * reference explodes to one row per (pipeline, assay) and `;`-joins
  * list fields. We parse driver-side (YAML configs are KBs, never data
  * scale), keep list fields as native arrays, and only `array_join`
  * at export.
  */
object Assay {

  val schema: StructType = StructType(Seq(
    StructField("SEQ_ASSAY_ID", StringType),
    StructField("SEQ_PIPELINE_ID", StringType),
    StructField("LIBRARY_SELECTION", StringType),
    StructField("LIBRARY_STRATEGY", StringType),
    StructField("PLATFORM", StringType),
    StructField("INSTRUMENT_MODEL", StringType),
    StructField("TARGET_CAPTURE_KIT", StringType),
    StructField("NUMBER_OF_GENES", IntegerType),
    StructField("READ_LENGTH", IntegerType),
    StructField("GENE_PADDING", IntegerType),
    StructField("CALLING_STRATEGY", StringType),
    StructField("SPECIMEN_TUMOR_CELLULARITY", StringType),
    StructField("ALTERATION_TYPES", ArrayType(StringType)),
    StructField("PRESERVATION_TECHNIQUE", ArrayType(StringType)),
    StructField("COVERAGE", ArrayType(StringType))))

  private def str(m: java.util.Map[String, Object], k: String): String =
    Option(m.get(k)).map(_.toString).orNull

  private def int(m: java.util.Map[String, Object], k: String): Integer =
    Option(m.get(k)).map(v => Integer.valueOf(v.toString.toDouble.toInt)).orNull

  private def strList(m: java.util.Map[String, Object], k: String): Seq[String] =
    Option(m.get(k)) match {
      case Some(l: java.util.List[_]) => l.asScala.map(_.toString).toSeq
      case Some(v)                    => Seq(v.toString)
      case None                       => null
    }

  /** Parse assay YAML text into one row per (pipeline, assay). */
  def parse(spark: SparkSession, yamlText: String): DataFrame = {
    val yaml = new org.yaml.snakeyaml.Yaml()
    val root = yaml.load[java.util.Map[String, Object]](yamlText)
    val rows = root.asScala.toSeq.sortBy(_._1).flatMap { case (pipelineId, vAny) =>
      val p = vAny.asInstanceOf[java.util.Map[String, Object]]
      val assays = Option(p.get("assay_specific_info")) match {
        case Some(l: java.util.List[_]) =>
          l.asScala.map(_.asInstanceOf[java.util.Map[String, Object]]).toSeq
        case _ => Seq(new java.util.HashMap[String, Object]())
      }
      assays.map { a =>
        Row(
          Option(str(a, "SEQ_ASSAY_ID")).getOrElse(pipelineId),
          pipelineId,
          str(p, "library_selection"), str(p, "library_strategy"),
          str(p, "platform"), str(p, "instrument_model"),
          str(p, "target_capture_kit"),
          int(a, "number_of_genes"), int(p, "read_length"),
          Option(int(a, "gene_padding")).getOrElse(Integer.valueOf(10)),
          str(p, "calling_strategy"),
          str(a, "specimen_tumor_cellularity"),
          strList(a, "alteration_types"),
          strList(a, "preservation_technique"),
          strList(a, "coverage"))
      }
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Export view with `;`-joined list columns (assay.py:117-126). */
  def exportView(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case ArrayType(StringType, _) => d.withColumn(f.name, array_join(col(f.name), ";"))
        case _                        => d
      }
    }
}
