package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Oncotree code tree ingestion (SURVEY §1.1 / C15; reference
  * process_functions.py:708-753 `extract_oncotree_code_mappings_from_
  * oncotree_json` — recursive JSON walk producing code → {primary,
  * secondary, cancer_type, cancer_type_detailed}).
  *
  * The tree is KBs — parsed driver-side (Jackson, shipped with Spark)
  * into a small DataFrame that joins `broadcast()` against clinical
  * tables (J5/P10/F6). Codes are upper-cased like the reference's
  * case-insensitive lookup.
  */
object Oncotree {

  final case class Node(code: String, primary: String, secondary: String,
                        cancerType: String, cancerTypeDetailed: String)

  /** Recursively flatten the oncotree JSON (root: map of code → node,
    * each node carrying `children` of the same shape).
    */
  def parse(jsonText: String): Seq[Node] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(jsonText)

    def walk(node: com.fasterxml.jackson.databind.JsonNode,
             primary: String, secondary: String): Seq[Node] = {
      val code = Option(node.get("code")).map(_.asText).getOrElse("")
      val name = Option(node.get("name")).map(_.asText).getOrElse("")
      val mainType = Option(node.get("mainType"))
        .filterNot(_.isNull).map(_.asText).getOrElse("")
      val level = Option(node.get("level")).map(_.asInt).getOrElse(-1)
      val (pri, sec) =
        if (level == 1) (code, "")
        else if (secondary.isEmpty && primary.nonEmpty && level == 2) (primary, code)
        else (primary, secondary)
      val self =
        if (code.nonEmpty && level != 0)
          Seq(Node(code.toUpperCase, pri.toUpperCase, sec.toUpperCase, mainType, name))
        else Nil
      val children = Option(node.get("children")).toSeq.flatMap { ch =>
        ch.properties().asScala.map(_.getValue).flatMap(walk(_, pri, sec))
      }
      self ++ children
    }

    root.properties().asScala.map(_.getValue).flatMap(walk(_, "", "")).toSeq
  }

  /** Broadcast-ready mapping DataFrame: ONCOTREE_CODE, CANCER_TYPE,
    * CANCER_TYPE_DETAILED, PRIMARY_CODE, SECONDARY_CODE.
    */
  def toDataFrame(spark: SparkSession, nodes: Seq[Node]): DataFrame = {
    import spark.implicits._
    nodes.map(n => (n.code, n.cancerType, n.cancerTypeDetailed, n.primary, n.secondary))
      .toDF("ONCOTREE_CODE", "CANCER_TYPE", "CANCER_TYPE_DETAILED", "PRIMARY_CODE", "SECONDARY_CODE")
  }
}
