// Scratch micro-probe for optimization work: times named sub-pieces of
// the expensive queries under the SAME session configs as graft.Bench.
// sbt "runMain graft.tools.OptProbe <sfDir> <probe...>"  (not part of
// any gate; numbers inform OPTIMIZATION_r12.md).
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object OptProbe {

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = if (args.length > 1) args.tail.toSet else Set.empty[String]
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.{DedupFunctions => D, VectorFunctions => V, TextFunctions => T}

    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")

    val probes = scala.collection.mutable.LinkedHashMap[String, () => Unit]()
    def probe(name: String)(f: => Unit): Unit = probes(name) = () => f

    // ---- minhash audit pieces ----
    probe("audit_cand") {
      val toks = array_distinct(T.tokens(lower(col("text"))))
      noop(D.lshCandidatePairs(d, "doc_id", toks, k = 16, bands = 4))
    }
    probe("audit_hs") {
      val th = graft.plans.ShingleHashExpr.shingleHashes(col("text"), 1)
      noop(d.select(col("doc_id"), th.as("th")))
    }
    probe("audit_paircounts") {
      val toks = array_distinct(T.tokens(lower(col("text"))))
      val th = graft.plans.ShingleHashExpr.shingleHashes(col("text"), 1)
      val hs = d.select(col("doc_id"), th.as("th")).persist()
      val cand = D.lshCandidatePairs(d, "doc_id", toks, k = 16, bands = 4).persist()
      val pc = cand
        .join(hs.select(col("doc_id").as("id_a"), col("th").as("__ta")), Seq("id_a"))
        .join(hs.select(col("doc_id").as("id_b"), col("th").as("__tb")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          size(array_intersect(col("__ta"), col("__tb"))).cast("long").as("__i"),
          size(array_union(col("__ta"), col("__tb"))).cast("long").as("__u"))
      noop(pc)
      spark.catalog.clearCache()
    }
    probe("audit_paircounts_sorted") {
      val toks = array_distinct(T.tokens(lower(col("text"))))
      val th = graft.plans.ShingleHashExpr.shingleHashes(col("text"), 1)
      val hs = d.select(col("doc_id"), th.as("th")).persist()
      val cand = D.lshCandidatePairs(d, "doc_id", toks, k = 16, bands = 4).persist()
      val inter = graft.plans.SortedIntersectCount
        .sortedIntersectCount(col("__ta"), col("__tb"))
      val pc = cand
        .join(hs.select(col("doc_id").as("id_a"), col("th").as("__ta")), Seq("id_a"))
        .join(hs.select(col("doc_id").as("id_b"), col("th").as("__tb")), Seq("id_b"))
        .select(col("id_a"), col("id_b"), inter.as("__i"),
          (size(col("__ta")) + size(col("__tb"))).cast("long").as("__s"))
        .select(col("id_a"), col("id_b"), col("__i"),
          (col("__s") - col("__i")).as("__u"))
      noop(pc)
      spark.catalog.clearCache()
    }
    probe("audit_full") {
      noop(graft.SparkEntry.queries("dedup_minhash_audit")(spark, sfDir))
      spark.catalog.clearCache()
    }

    // ---- brute-force kNN pieces ----
    probe("knn_brute") { noop(V.knnGraph(emb, "vec_id", "embedding", 3)) }
    probe("knn_brute_wide") {
      val e32 = emb.repartition(spark.sparkContext.defaultParallelism)
      val q = e32.select(col("vec_id").as("q_id"), col("embedding").as("__qv"))
      val c = e32.select(col("vec_id").as("c_id"), col("embedding").as("__cv"))
      noop(V.bruteForceTopK(q, c, "q_id", "c_id", "__qv", "__cv", 3))
    }

    // ---- candidate-pair internals ----
    probe("cand_nodistinct") {
      val toks = array_distinct(T.tokens(lower(col("text"))))
      val sig = d.select(col("doc_id").as("id"),
        graft.plans.MinHashSignature.signature(toks, 16).as("sig"))
      val keys = sig.select(col("id"),
        explode(D.bandKeys(col("sig"), 4, 4)).as("band_key"))
      val small = keys.groupBy(col("band_key")).agg(count(lit(1)).as("__df"))
        .filter(col("__df") <= 10000).select("band_key")
      val kept = graft.core.Fan.widenBy(
        keys.join(small, Seq("band_key"), "left_semi"), col("band_key"))
      noop(kept.as("a").join(kept.as("b"), Seq("band_key"))
        .filter(col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b")))
    }
    probe("cand_keys_only") {
      val toks = array_distinct(T.tokens(lower(col("text"))))
      val sig = d.select(col("doc_id").as("id"),
        graft.plans.MinHashSignature.signature(toks, 16).as("sig"))
      noop(sig.select(col("id"),
        explode(D.bandKeys(col("sig"), 4, 4)).as("band_key")))
    }

    // ---- simhash pair internals ----
    probe("simhash_nodistinct") {
      val keys = D.simhashBlockRows(d, "doc_id", T.tokens(lower(col("text"))), 32, 3)
      val small = keys.groupBy("blk", "bv").agg(count(lit(1)).as("__df"))
        .filter(col("__df") <= 10000).select("blk", "bv")
      val kept = graft.core.Fan.widenBy(
        keys.join(small, Seq("blk", "bv"), "left_semi"), col("blk"), col("bv"))
      noop(kept.as("x")
        .join(kept.as("y"),
          col("x.blk") === col("y.blk") && col("x.bv") === col("y.bv") &&
            col("x.id") < col("y.id"))
        .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
          D.hammingDistance(col("x.sh"), col("y.sh")).cast("long").as("hamming"))
        .filter(col("hamming") <= 3))
    }
    probe("simhash_sorted") {
      noop(D.simhashHammingPairs(d, "doc_id",
        T.tokens(lower(col("text"))), bits = 32, maxHamming = 3)
        .orderBy("id_a", "id_b"))
    }

    // ---- simhash pair pieces ----
    probe("simhash_rows") {
      noop(D.simhashBlockRows(d, "doc_id", T.tokens(lower(col("text"))), 32, 3))
    }
    probe("simhash_pairs") {
      noop(D.simhashHammingPairs(d, "doc_id",
        T.tokens(lower(col("text"))), bits = 32, maxHamming = 3))
    }

    // ---- gram postings / repeated spans pieces ----
    probe("gram_postings") { noop(D.gramPostings(d, "doc_id", "text", 5)) }
    probe("repeated_spans") {
      noop(D.repeatedSpanStats(d, "doc_id", "text", n = 5, minCount = 2L))
    }

    // ---- kmeans ----
    probe("kmeans_256") {
      noop(V.kmeansCentroids(emb, "vec_id", "embedding", 256, 2))
    }
    probe("kmeans_assign_256") {
      val cents = V.kmeansCentroids(emb, "vec_id", "embedding", 256, 2)
      noop(V.kmeansAssign(emb, "vec_id", "embedding", cents))
    }

    probe("audit_cand_metrics") {
      val toks = array_distinct(T.tokens(lower(col("text"))))
      val df = D.lshCandidatePairs(d, "doc_id", toks, k = 16, bands = 4)
      val t0 = System.nanoTime()
      PlanMetrics.runAndCount(df)
      println(f"audit_cand runAndCount: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
        val ms = p.metrics.map { case (k, m) => s"$k=${m.value}" }.mkString(" ")
        println(s"NODE ${p.nodeName}  $ms")
        p.children.foreach(walk)
        p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            walk(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            walk(q.plan)
          case r: org.apache.spark.sql.execution.adaptive.AQEShuffleReadExec =>
            r.children.foreach(walk)
          case _ => ()
        }
      }
      walk(df.queryExecution.executedPlan)
    }

    val sel = probes.filter { case (n, _) => which.isEmpty || which(n) }
    // one untimed warmup of each, then min-of-2 timed
    sel.foreach { case (n, f) =>
      try f() catch { case e: Throwable => println(s"$n warmup failed: $e") }
      spark.catalog.clearCache()
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        f()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $n%-28s ${ts.min}%8.3f s  (runs: ${ts.map(t => f"$t%.3f").mkString(", ")})")
    }
    spark.stop()
  }
}
