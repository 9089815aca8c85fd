package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

class NormalizeTextExpressionSpec extends SparkSpec {
  import spark.implicits._

  test("NFC + casefold + punct/ws folding collapse byte-distinct variants") {
    val variants = Seq(
      "Hello  World Cafe\u0301 #1", // decomposed accent, double space, punct
      "HELLO WORLD  caf\u00e9  1", // composed accent, uppercase
      "hello world caf\u00e9 1" // already canonical
    ).toDF("v")
    val canon = variants
      .select(TextFunctions.normalizeText(col("v")).as("c"))
      .as[String].collect().toSet
    assert(canon == Set("hello world caf\u00e9 1"))
  }

  test("stripPunct=false keeps punctuation; null and empty pass through") {
    val got = Seq("A  -  B!", "", null)
      .toDF("v")
      .select(TextFunctions.normalizeText(col("v"), stripPunct = false).as("c"))
      .collect().map(r => Option(r.getString(0)))
    assert(got.toSeq == Seq(Some("a - b!"), Some(""), None))
  }

  test("SQL registration plans the same native expression as the Column API") {
    GraftExtensions.register(spark)
    Seq("  MiXeD À case!!").toDF("v").createOrReplaceTempView("norm_v")
    val viaSql = spark.sql(
      "SELECT normalize_text(v) AS a, normalize_text(v, false) AS b FROM norm_v")
      .collect().head
    val viaCol = Seq("  MiXeD À case!!").toDF("v")
      .select(TextFunctions.normalizeText(col("v")).as("a"),
        TextFunctions.normalizeText(col("v"), stripPunct = false).as("b"))
      .collect().head
    assert(viaSql == viaCol)
    assert(viaSql.getString(0) == "mixed \u00e0 case")
    // no UDF: the plan must not contain any udf node
    val plan = spark.sql("SELECT normalize_text(v) FROM norm_v")
      .queryExecution.executedPlan.toString.toLowerCase
    assert(!plan.contains("udf"), plan)
  }
}
