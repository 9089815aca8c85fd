package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the invariant [[Fan.widen]]/[[Fan.widenBy]] stand on (r12
  * verdict, "What's wrong" #3): at every representative call-site
  * shape, `optimizedPlan.stats.sizeInBytes` is a REAL scan-derived
  * estimate — small at toy scale, so widen FIRES — not a garbage-large
  * join/aggregate product that would silently turn widen into the
  * identity exactly where it is wanted. If a Spark upgrade or a
  * call-site refactor breaks the estimate, these fail loudly instead
  * of the whole technique silently no-op'ing.
  */
class FanWidenSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def threshold: BigInt =
    BigInt(spark.sessionState.conf.filesMaxPartitionBytes) *
      spark.sparkContext.defaultParallelism

  private def est(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes

  private def fires(df: DataFrame): Boolean = Fan.widen(df) ne df
  private def firesBy(df: DataFrame, keys: org.apache.spark.sql.Column*): Boolean =
    Fan.widenBy(df, keys: _*) ne df

  test("widen fires on the brute-kNN corpus projection (scan estimate)") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    assert(est(emb) < threshold,
      s"scan estimate ${est(emb)} not below threshold $threshold")
    assert(fires(emb), "widen must fire on the byte-small corpus side")
  }

  test("widenBy fires on the LSH posting self-join input (post-semi-join estimate)") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val toks = array_distinct(graft.functions.TextFunctions.tokens(lower(col("text"))))
    val sig = d.select(col("doc_id").as("id"),
      graft.plans.MinHashSignature.signature(toks, 16).as("sig"))
    val keys = sig.select(col("id"),
      explode(graft.functions.DedupFunctions.bandKeys(col("sig"), 4, 4)).as("band_key"))
    val small = keys.groupBy(col("band_key")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= 10000).select("band_key")
    val kept = keys.join(small, Seq("band_key"), "left_semi")
    // the semi-join sits ABOVE an aggregate — the shape most at risk of
    // a garbage-large estimate
    assert(est(kept) < threshold,
      s"semi-join estimate ${est(kept)} not below threshold $threshold")
    assert(firesBy(kept, col("band_key")))
  }

  test("widen is the identity once the estimate crosses the threshold") {
    // force a tiny threshold instead of fabricating a 100 TB frame: the
    // SAME frame must pass through untouched when bytes can reach the
    // cluster parallelism on their own
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val key = "spark.sql.files.maxPartitionBytes"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "1")
      assert(est(emb) >= threshold)
      assert(!fires(emb), "widen must be the identity at scale")
    } finally spark.conf.set(key, old)
  }

  test("widen fires on the gram-postings document side") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    assert(est(d) < threshold)
    assert(fires(d))
  }
}
