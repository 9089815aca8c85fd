package graft.sources

import graft.SparkSpec

class OncotreeSpec extends SparkSpec {

  private val json =
    """{
      |  "TISSUE": {
      |    "code": "TISSUE", "name": "Tissue", "mainType": null, "level": 0,
      |    "children": {
      |      "LUNG": {
      |        "code": "LUNG", "name": "Lung", "mainType": null, "level": 1,
      |        "children": {
      |          "NSCLC": {
      |            "code": "NSCLC", "name": "Non-Small Cell Lung Cancer",
      |            "mainType": "Non-Small Cell Lung Cancer", "level": 2,
      |            "children": {
      |              "luad": {
      |                "code": "luad", "name": "Lung Adenocarcinoma",
      |                "mainType": "Non-Small Cell Lung Cancer", "level": 3,
      |                "children": {}
      |              }
      |            }
      |          }
      |        }
      |      }
      |    }
      |  }
      |}""".stripMargin

  test("C15: recursive flatten with primary/secondary propagation") {
    val nodes = Oncotree.parse(json)
    val byCode = nodes.map(n => n.code -> n).toMap
    assert(byCode.keySet == Set("LUNG", "NSCLC", "LUAD")) // root level-0 excluded, codes uppercased
    assert(byCode("LUAD").primary == "LUNG")
    assert(byCode("LUAD").secondary == "NSCLC")
    assert(byCode("LUAD").cancerType == "Non-Small Cell Lung Cancer")
    assert(byCode("NSCLC").primary == "LUNG")
  }

  test("broadcast map joins against clinical codes case-insensitively") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val map = Oncotree.toDataFrame(spark, Oncotree.parse(json))
    val clinical = Seq(("s1", "luad"), ("s2", "NSCLC"), ("s3", "GONE"))
      .toDF("SAMPLE_ID", "ONCOTREE_CODE")
    val mapped = clinical
      .withColumn("ONCOTREE_CODE", upper($"ONCOTREE_CODE"))
      .join(broadcast(map), Seq("ONCOTREE_CODE"), "left")
    // F6: deprecated codes → null CANCER_TYPE → dropped at release
    assert(mapped.filter($"CANCER_TYPE".isNull).select("SAMPLE_ID").as[String].collect().toSeq == Seq("s3"))
  }
}
