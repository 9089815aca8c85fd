package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FreqItemsAggregateSpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish stream: item i appears ~N/i times — a few heavy items,
    * a long tail, deterministic.
    */
  private def zipfItems(n: Int): Seq[String] =
    (1 to n).map(i => s"item${java.lang.Long.numberOfTrailingZeros(i)}")

  test("MG guarantee: every item above N/(k+1) survives any partitioning") {
    val items = zipfItems(4096) // item0: 2048, item1: 1024, ...
    val n = items.length.toLong
    val k = 8
    val exactHeavy = items.groupBy(identity)
      .map { case (it, occ) => it -> occ.length.toLong }
      .filter(_._2 > n / (k + 1)).keySet
    for (parts <- Seq(1, 3, 16)) {
      val cand = items.toDF("item").repartition(parts)
        .agg(FreqItemsAggregate.freqCandidates(col("item"), k).as("c"))
        .select(explode(col("c")).as("item")).as[String].collect().toSet
      assert(cand.size <= k)
      assert(exactHeavy.subsetOf(cand),
        s"parts=$parts lost ${exactHeavy -- cand}")
    }
  }

  test("distinct items <= k: candidates are exactly the distinct set; nulls skipped") {
    val df = Seq(Some("a"), Some("b"), Some("a"), None, Some("c"))
      .toDF("item")
    val cand = df.agg(FreqItemsAggregate.freqCandidates(col("item"), 10).as("c"))
      .select(explode(col("c")).as("item")).as[String].collect().toSeq
    assert(cand == Seq("a", "b", "c")) // sorted, null never tracked
  }

  test("freq_candidates is SQL-callable and matches the Column API") {
    GraftExtensions.register(spark)
    zipfItems(512).toDF("item").createOrReplaceTempView("freq_in")
    val viaSql = spark.sql(
      "SELECT freq_candidates(item, 6) AS c FROM freq_in")
      .select(col("c").cast("string")).as[String].head()
    val viaCol = zipfItems(512).toDF("item")
      .agg(FreqItemsAggregate.freqCandidates(col("item"), 6).as("c"))
      .select(col("c").cast("string")).as[String].head()
    assert(viaSql == viaCol)
  }

  test("freq_candidates SQL on non-string input stringifies like the Column API") {
    GraftExtensions.register(spark)
    // DATE is the type where the two entry points used to disagree: the
    // SQL path passed the raw child, so the aggregate's eval saw the
    // internal days-since-epoch int ("20329") while the Column API cast
    // to string first ("2025-08-27"); both must produce the external form
    spark.sql("SELECT date_add(DATE '2025-08-27', CAST(id % 3 AS INT)) AS d FROM range(30)")
      .createOrReplaceTempView("freq_dates")
    val viaSql = spark.sql("SELECT freq_candidates(d, 5) AS c FROM freq_dates")
      .select(explode(col("c")).as("v")).as[String].collect().toSeq
    val viaCol = spark.table("freq_dates")
      .agg(FreqItemsAggregate.freqCandidates(col("d"), 5).as("c"))
      .select(explode(col("c")).as("v")).as[String].collect().toSeq
    assert(viaSql == viaCol)
    assert(viaSql.forall(_.startsWith("2025-")), s"external date form expected: $viaSql")
  }

  test("heavyHitters composite equals the exact full-groupBy answer") {
    // docs whose token stream is the zipf stream, split across rows
    val docs = zipfItems(2048).grouped(64).zipWithIndex
      .map { case (toks, i) => (i.toLong, toks.mkString(" ")) }
      .toSeq.toDF("doc_id", "text").repartition(5)
    val got = graft.functions.Curation
      .heavyHitters(docs, "text", sketchK = 16, num = 1L, den = 10L)
      .as[(String, Long)].collect().toMap
    val tok = docs.select(explode(split(trim(lower(col("text"))), "\\s+")).as("t"))
    val n = tok.count()
    val expect = tok.groupBy("t").count()
      .filter(col("count") * 10 > lit(n))
      .as[(String, Long)].collect().toMap
    assert(got == expect)
  }

  test("threshold below the MG guarantee is rejected") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      graft.functions.Curation.heavyHitters(docs, "text",
        sketchK = 4, num = 1L, den = 100L)
    }
  }
}
