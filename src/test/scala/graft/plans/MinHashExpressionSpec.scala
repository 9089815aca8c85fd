package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{DedupFunctions, TextFunctions}

class MinHashExpressionSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha beta gamma delta epsilon"),
    (2L, "alpha beta gamma delta epsilon"),
    (3L, "the quick brown fox jumps over the lazy dog"),
    (4L, "")
  ).toDF("doc_id", "text")

  test("native expression matches an independent driver-side reference bit-for-bit") {
    // reference: BigInt arithmetic over the md5 hex string — the same
    // derivation the DuckDB oracle replays (one digest per token,
    // component i = min of (h1 + i*h2) mod 2^64 as 16-char lower hex)
    def refSig(toks: Seq[String], k: Int): Seq[String] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val two64 = BigInt(2).pow(64)
      val mins = Array.fill(k)(Option.empty[BigInt])
      toks.foreach { t =>
        val hexStr = md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
        val h1 = BigInt(hexStr.substring(0, 16), 16)
        val h2 = BigInt(hexStr.substring(16, 32), 16)
        (0 until k).foreach { i =>
          val v = (h1 + BigInt(i) * h2).mod(two64)
          if (mins(i).forall(v < _)) mins(i) = Some(v)
        }
      }
      mins.toSeq.map(_.map(v => f"$v%016x").getOrElse(""))
    }
    val tokenSets = Seq(
      Seq("alpha", "beta", "gamma"), Seq("alpha", "beta"),
      Seq(""), Seq("one", "one", "two"), Seq.empty[String])
    val df = tokenSets.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "toks")
    val got = df.select(col("id"), MinHashSignature.signature(col("toks"), 8))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    tokenSets.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == refSig(t, 8), s"token set $t")
    }
  }

  test("SQL registration via extensions works and survives codegen") {
    GraftExtensions.register(spark)
    docs.createOrReplaceTempView("mh_docs")
    val out = spark.sql(
      """SELECT doc_id, minhash_signature(split(lower(trim(text)), '\\s+'), 4) AS sig
         FROM mh_docs""").collect()
    assert(out.length == 4)
    val byId = out.map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(byId(1L) == byId(2L))   // identical docs → identical signatures
    assert(byId(1L) != byId(3L))
    assert(byId(1L).forall(_.length == 16)) // 64-bit lower hex

    // the full SQL function surface: dot_product + winnow resolve and
    // agree with their Column-API twins
    val dp = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D))")
      .collect()(0).getDouble(0)
    assert(dp == 32.0)
    val win = spark.sql(
      """SELECT doc_id, winnow(text, 5, 4) AS sel FROM mh_docs""").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val colApi = docs.select(col("doc_id"),
        TextFunctions.winnowHashes(col("text"), k = 5, w = 4).as("sel"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(win == colApi && win(3L).nonEmpty)
  }

  test("column-composition SQL surface matches the Scala API") {
    GraftExtensions.register(spark)
    docs.createOrReplaceTempView("mh_docs")
    val sqlOut = spark.sql(
      """SELECT doc_id, lang_id(text) AS lang, quality_score(text) AS q,
                token_count(text) AS n, scrub_pii(text) AS clean,
                doc_fingerprint(text) AS fp,
                simhash(split(lower(trim(text)), '\\s+'), 8) AS sh
         FROM mh_docs""").collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val colOut = docs.select(col("doc_id"),
        TextFunctions.langId(col("text")),
        TextFunctions.qualityScore(col("text")),
        TextFunctions.tokenCount(col("text")),
        TextFunctions.scrubPii(col("text")),
        TextFunctions.fingerprint(col("text")),
        graft.functions.DedupFunctions.simhash(
          TextFunctions.tokens(lower(col("text"))), 8))
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(sqlOut == colOut)
    val cs = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      .collect()(0).getDouble(0)
    assert(math.abs(cs - 1.0) < 1e-12)

    // round-4 additions: shingle hashes, token/gram stats, z-order key
    val extra = spark.sql(
      """SELECT doc_id, shingle_hashes(text, 3) AS sh,
                token_gram_stats(text, 2).n_tok AS nt,
                zorder_key(doc_id, doc_id + 1) AS zk
         FROM mh_docs""").collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val extraCol = docs.select(col("doc_id"),
        ShingleHashExpr.shingleHashes(col("text"), 3),
        TokenGramStatsExpr.stats(col("text"), 2).getField("n_tok"),
        graft.sources.Layout.zorderKey2(col("doc_id"), col("doc_id") + 1))
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(extra == extraCol)
  }

  test("native lang_id matches the composed decision rule on every doc") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val cmp = d.select(
      graft.functions.TextFunctions.langId(col("text")).as("native"),
      graft.functions.TextFunctions.langIdComposed(col("text")).as("composed"))
    assert(cmp.filter(col("native") =!= col("composed")).count() == 0)
    assert(cmp.filter(col("native").isin("de", "en", "es", "fr", "und")).count() == d.count())
  }

  test("literal-k misuse fails cleanly") {
    GraftExtensions.register(spark)
    docs.createOrReplaceTempView("mh_docs")
    intercept[Exception] {
      spark.sql("SELECT minhash_signature(split(text, ' '), doc_id) FROM mh_docs").collect()
    }
  }
}
