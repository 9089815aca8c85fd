package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T, VectorFunctions => V}
import graft.operators.{RangeJoin, Upsert}

/** 10× scale smoke: derive a ~6M-row lineitem and ~5k-doc corpus from
  * sf0.1 by unioning shifted copies, then time the operators whose cost
  * curves matter (binned range join, PK upsert diff, minhash+LSH,
  * windowed deltas, brute-force vs bucketed ANN). Prints one line per
  * op: name, input rows, seconds.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "24g")
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft_smoke_warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String, rows: Long)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"SMOKE $name%-28s in=$rows%9d out=$n%9d ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }

    val li0 = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val li = (0 until mult).map(i => li0.withColumn("l_orderkey", col("l_orderkey") + i * 10000000L))
      .reduce(_ unionByName _).persist()
    val nLi = li.count()

    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
    val docs = (0 until mult).map(i => docs0.withColumn("doc_id", col("doc_id") + i * 1000000L))
      .reduce(_ unionByName _).persist()
    val nDocs = docs.count()

    // 1. binned range join at 6M points × 25 bands
    val bands = spark.read.parquet(s"$sfDir/part.parquet").groupBy("p_brand")
      .agg(min("p_retailprice").as("lo"), max("p_retailprice").as("hi"))
      .withColumn("g", lit(1))
    val points = li.withColumn("unit_price", col("l_extendedprice") / greatest(col("l_quantity"), lit(1.0)))
      .withColumn("g", lit(1)).withColumn("p_end", col("unit_price"))
      .select("g", "l_orderkey", "l_linenumber", "unit_price", "p_end")
    time("binned_range_join", nLi) {
      RangeJoin.binnedOverlap(points, bands, "g", "unit_price", "p_end", "lo", "hi", 200L).count()
    }

    // 2. PK upsert diff at 6M×6M (single full-outer pass)
    val incoming = li.filter(col("l_orderkey") % 3 =!= 0)
    val existing = li.filter(col("l_orderkey") % 2 =!= 0)
    val pk4 = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    time("upsert_diff", nLi) {
      val d = Upsert.diff(incoming, existing, pk4)
      d.appends.count() + d.updates.count() + d.deletes.count()
    }

    // 2b. the operational default: existing side ALREADY bucketed+sorted
    // on the full PK (as the previous merge left it), so the diff join
    // plans with no exchange and no sort on the existing side. Staging
    // cost is the previous merge's write, reported separately.
    val stagedT0 = System.nanoTime()
    val staged = Upsert.stageBucketed(existing, "smoke_upsert_staged", pk4, 32)
    println(f"SMOKE upsert_stage_bucketed (1x)   ${(System.nanoTime() - stagedT0) / 1e9}%7.2f s")
    val bucketedPlan = Upsert.classify(incoming, staged, pk4, nullSafeKeys = false)
      .queryExecution.executedPlan.toString
    require("Exchange hashpartitioning".r.findAllIn(bucketedPlan).size == 1,
      s"bucketed upsert must shuffle ONLY the incoming side:\n$bucketedPlan")
    require(bucketedPlan.contains("Bucketed: true"),
      s"existing side must use the bucketed scan:\n$bucketedPlan")
    time("upsert_diff_bucketed", nLi) {
      val d = Upsert.diff(incoming, staged, pk4, nullSafeKeys = false)
      d.appends.count() + d.updates.count() + d.deletes.count()
    }
    spark.sql("DROP TABLE IF EXISTS smoke_upsert_staged")

    // 3. native minhash + LSH band keys over the corpus
    time("minhash_lsh_sigs", nDocs) {
      val toks = array_distinct(T.tokens(lower(col("text"))))
      val sig = docs.select(col("doc_id"), graft.plans.MinHashSignature.signature(toks, 16).as("sig"))
      sig.select(col("doc_id"), explode(graft.functions.DedupFunctions.bandKeys(col("sig"), 4, 4)).as("bk"))
        .groupBy("bk").count().count()
    }

    // 4. windowed adjacent deltas over 6M rows
    time("window_adjacent_deltas", nLi) {
      graft.operators.WindowOps.adjacentDeltas(
        li.select("l_suppkey", "l_orderkey", "l_extendedprice"),
        Seq("l_suppkey"), Seq("l_orderkey"), Seq("l_extendedprice")).count()
    }

    // 5. ANN: brute force vs sign-bucket LSH over replicated embeddings
    val emb0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val emb = (0 until mult * 4).map(i => emb0.withColumn("vec_id", col("vec_id") + i * 1000000L))
      .reduce(_ unionByName _).persist()
    val nEmb = emb.count()
    val q = emb.filter(col("vec_id") < 10).select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val c = emb.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
    time("ann_bruteforce_topk", nEmb) {
      V.bruteForceTopK(q, c, "q_id", "c_id", "q_vec", "c_vec", 5).count()
    }
    time("ann_lsh_topk", nEmb) {
      V.lshTopK(q, c, "q_id", "c_id", "q_vec", "c_vec", 5, bits = 8).count()
    }
    time("ann_banded_lsh_topk", nEmb) {
      V.bandedLshTopK(q, c, "q_id", "c_id", "q_vec", "c_vec", 5, bands = 3, bitsPerBand = 8).count()
    }

    // 6. banded near-dup over the replicated embedding corpus.
    // bitsPerBand sizes the bucket space and MUST scale with the corpus:
    // 8 bits (256 buckets) over 80k vectors put ~300 vectors per bucket
    // and the per-band self-join enumerated ~10^8 candidates (42 s);
    // 16 bits (65k buckets) emits the identical pair set in 7.5 s.
    time("neardup_banded", nEmb) {
      V.bandedNearDup(emb, "vec_id", "embedding", bands = 3, bitsPerBand = 16,
        minCos = 0.95).count()
    }

    // 7. curation decision + sharded packing over the 10× corpus
    time("curate_decision", nDocs) {
      graft.functions.Curation.curate(docs.select("doc_id", "text"),
        "doc_id", "text", Seq("de", "en", "es", "fr"), 0.5)
        .filter(col("keep")).count()
    }
    // Bloom decontamination at mult× the corpus: the eval slice stays
    // gate-sized (~1%), the bitset is 32 KiB regardless, and the train
    // pass is the fused native expression — expect near-linear scan
    // cost, zero shuffle
    time("bloom_decontam", nDocs) {
      graft.functions.DedupFunctions.bloomDecontaminate(
          docs.filter(col("doc_id") % 97 =!= 0),
          docs.filter(col("doc_id") % 97 === 0),
          "doc_id", "text", n = 5, seeds = 3, mBits = 1 << 18)
        .filter(col("flagged")).count()
    }
    time("pack_sequences", nDocs) {
      val d = docs.select(col("doc_id"), (col("doc_id") % 256).as("shard"),
        T.tokenCount(col("text")).cast("long").as("n_tokens"))
      graft.functions.Curation.packByBudget(d, "shard", "doc_id", "n_tokens", 2048L)
        .groupBy("shard").agg(max("pack_id")).count()
    }

    // 8. LSH clustering: bucket-star edges + connected components over
    // the 10× corpus (500k docs, heavy replication → big components)
    time("cc_cluster_assign", nDocs) {
      val toks = array_distinct(T.tokens(lower(col("text"))))
      val edges = graft.functions.DedupFunctions.lshBucketStarEdges(
        docs, "doc_id", toks, k = 4, bands = 2)
      graft.operators.ConnectedComponents.clusters(
        docs.select("doc_id"), "doc_id", edges, "id_a", "id_b").count()
    }

    // 9. as-of join: 6M clicks against 6M views, one shuffle
    val ev0 = spark.read.parquet(s"$sfDir/events.parquet")
    val ev = (0 until mult).map(i =>
        ev0.withColumn("event_id", col("event_id") + i * 100000000L)
          .withColumn("user_id", col("user_id") + i * 1000000L))
      .reduce(_ unionByName _).persist()
    val nEv = ev.count()
    time("asof_join", nEv) {
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("vts"), col("event_id").as("vid"))
      graft.operators.AsOfJoin.backward(clicks, views, Seq("user_id"),
        "ts", "vts", Seq("vid")).count()
    }

    // 10. token-budget selection over the 10× corpus (two-level prefix)
    time("budget_select", nDocs) {
      val d = docs.select(col("doc_id"),
        T.qualityScore(col("text")).as("q"),
        T.tokenCount(col("text")).cast("long").as("n_tokens"))
      graft.functions.Sampling.budgetSelect(d, col("q"), col("doc_id"),
        col("n_tokens"), budget = 1000000L).count()
    }

    // 11. SCD2 merge: 6M-row current slice vs 4M-row snapshot (plus 6M
    // closed history that must NOT enter the join)
    time("scd2_merge", nLi) {
      val nullTo = lit(null).cast("long")
      val existing = li.select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("string").as("attr"),
          lit(-10L).as("valid_from"), lit(0L).as("valid_to"))
        .unionByName(li.select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("string").as("attr"),
          lit(0L).as("valid_from"), nullTo.as("valid_to")))
      val incoming = li.filter(col("l_orderkey") % 3 =!= 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          when(col("l_orderkey") % 5 === 0, lit("CHANGED"))
            .otherwise(col("l_quantity").cast("string")).as("attr"))
      graft.operators.Scd2.merge(existing, incoming,
        Seq("l_orderkey", "l_linenumber"), Seq("attr"), ts = 100L).count()
    }

    // 12. incremental aggregate refresh: delta-sized partial + tiny merge
    time("agg_incremental", nLi) {
      val sums = Map("l_quantity" -> "sum_qty")
      val stored = graft.operators.AggMaintain.partial(
        li.filter(col("l_orderkey") % 10 =!= 0), Seq("l_returnflag"), sums, "cnt")
      val delta = graft.operators.AggMaintain.partial(
        li.filter(col("l_orderkey") % 10 === 0), Seq("l_returnflag"), sums, "cnt")
      graft.operators.AggMaintain.merge(Seq(stored, delta),
        Seq("l_returnflag"), Seq("cnt", "sum_qty")).count()
    }

    // 13. overlapping chunking + PII scrub over the 10× corpus (pure
    // per-row expressions — the cost IS the scan)
    time("chunk_and_scrub", nDocs) {
      val toks = T.tokens(col("text"))
      val starts = sequence(lit(0), greatest(size(toks) - 1, lit(0)), lit(40))
      val chunks = transform(starts, st => array_join(slice(toks, st + 1, lit(50)), " "))
      docs.select(col("doc_id"), posexplode(chunks).as(Seq("idx", "chunk")))
        .select(md5(T.scrubPii(col("chunk")))).count()
    }

    // ---- round-4 operators ------------------------------------------

    // 14. native one-pass text signals over the 10× corpus (the HOF
    // forms these replaced were the round-3 bench's slowest rows)
    time("native_text_signals", nDocs) {
      docs.select(
        graft.plans.ShingleHashExpr.shingleHashes(col("text"), 5).as("sh"),
        T.topTokenFraction(col("text")).as("ttf"),
        T.dupNgramFraction(col("text"), 2).as("dnf"),
        graft.functions.DedupFunctions.simhash(
          T.tokens(lower(col("text"))), 16).as("sim"))
        .select(size(col("sh")) + col("sim")).count()
    }

    // 15. span dedup over the 10× corpus from a persisted winnow index.
    // maxDf scales with the replication factor: every span's df is
    // multiplied by `mult` here, and a fixed threshold would classify
    // the whole corpus as stop-spans (0 pairs — the round-4 first run).
    time("span_dedup", nDocs) {
      val idx = graft.functions.DedupFunctions.winnowIndex(
          docs, "doc_id", "text", k = 6, w = 16)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try graft.functions.DedupFunctions
        .spanContainmentFromIndex(idx, maxDf = 20 * mult, minShared = 2L).count()
      finally idx.unpersist(blocking = false)
    }

    // 15b. ExactSubstr repeated-substring pass over the 10× corpus:
    // the replicas make every original document's grams hit the
    // minCount=2 floor, so this measures the WORST case — nearly every
    // position covered, the island fold and the rewrite running over
    // the whole corpus. All the wide traffic is (hash, pos) longs;
    // text crosses once in the final rewrite join.
    time("repeated_span_stats", nDocs) {
      graft.functions.DedupFunctions.repeatedSpanStats(
        docs, "doc_id", "text", n = 5, minCount = 2L).count()
    }
    time("repeated_span_removal", nDocs) {
      graft.functions.DedupFunctions.removeRepeatedSpans(
        docs, "doc_id", "text", n = 5, minCount = 2L)
        .agg(sum(length(col("clean_text")))).collect()
      nDocs
    }

    // 16. PQ ANN over the 40× embedding corpus: sample-trained
    // codebooks, packed codes, native ADC lookup-sum, exact re-rank
    val embN = emb.select(col("vec_id"), V.l2normalize(col("embedding")).as("embedding"))
    time("pq_topk", nEmb) {
      val books = V.pqCodebooks(embN.filter(col("vec_id") % 50 === 0),
        "vec_id", "embedding", m = 4, dim = 64, ksub = 16, iters = 2)
      val qn = embN.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val cn = embN.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
      V.pqTopK(qn, cn, "q_id", "c_id", "q_vec", "c_vec", books,
        m = 4, dim = 64, k = 10, shortlist = 200).count()
    }

    // 16b. the operational split: index construction once (train +
    // encode + persist), then the query path answers from stored codes
    val pqIdxPath = s"${sys.props("java.io.tmpdir")}/graft_smoke_pq_index"
    time("pq_index_build", nEmb) {
      V.savePqIndex(embN, "vec_id", "embedding", pqIdxPath,
        m = 4, dim = 64, ksub = 16, iters = 2,
        trainFilter = col("vec_id") % 50 === 0)
      V.pqCodes(spark, pqIdxPath).count()
    }
    time("pq_topk_indexed", nEmb) {
      V.pqTopKFromIndex(pqIdxPath, embN, "vec_id", "embedding",
        col("vec_id") < 10, m = 4, dim = 64, k = 10, shortlist = 200).count()
    }
    // 16b2. O(delta) PQ refresh: a 10% re-ingest encodes against the
    // FROZEN codebooks and lands as one segment — the merge cost is
    // |delta| encode + one live-id semi-join, vs pq_index_build's full
    // train+encode
    time("pq_delta_merge", nEmb) {
      V.mergePqDelta(embN.filter(col("vec_id") % 10 === 3),
        "vec_id", "embedding", pqIdxPath, m = 4, dim = 64)
      V.pqCodes(spark, pqIdxPath).count()
    }

    // 16b3. IVF-PQ (IVFADC) at 40×: coarse cells + residual codes.
    // Query scans nprobe/clusters of the corpus as m-byte codes with
    // per-(query, cell) residual distance tables broadcast — the
    // billion-scale layout; build once, delta-merge O(delta)
    val ivfpqIdx = s"${sys.props("java.io.tmpdir")}/graft_smoke_ivfpq"
    time("ivfpq_index_build", nEmb) {
      V.saveIvfPqIndex(embN.filter(col("vec_id") % 4 =!= 0), "vec_id", "embedding",
        ivfpqIdx, clusters = 16, citers = 2, m = 4, dim = 64, ksub = 16,
        piters = 2, trainFilter = col("vec_id") % 50 === 0)
      graft.functions.SegmentedIndex.liveRows(spark, ivfpqIdx, "codes").count()
    }
    time("ivfpq_delta_merge", nEmb) {
      V.mergeIvfPqDelta(embN.filter(col("vec_id") % 4 === 0),
        "vec_id", "embedding", ivfpqIdx, m = 4, dim = 64)
      graft.functions.SegmentedIndex.liveRows(spark, ivfpqIdx, "codes").count()
    }
    time("ivfpq_query_indexed", nEmb) {
      V.ivfPqTopKFromIndex(ivfpqIdx, embN, "vec_id", "embedding",
        col("vec_id") < 10, m = 4, dim = 64, k = 10, shortlist = 200,
        nprobe = 2).count()
    }

    // 16b4. ANN parameter REALISM at the replicated corpus size:
    // √n-scaled coarse quantizer (256 cells for the ~200k-vector
    // corpus), m=8 codes, nprobe swept 8 → 32. The replicas get a
    // small deterministic per-copy perturbation first — identical
    // copies would make every query's exact top-k its own clones and
    // recall a tautology. Probing p of 256 cells scans ~p/256 of the
    // corpus as m-byte codes, so probe latency should grow with
    // nprobe while staying far below a full-corpus ADC pass — the
    // sub-linear probe property that makes IVF the 100 TB layout.
    // Recall@10 vs exact cosine prints per nprobe (near-random
    // harness embeddings cap the ceiling well below a clustered real
    // corpus; the committed rows document the cost/recall TREND).
    val embR = emb.select(col("vec_id"),
      V.l2normalize(transform(col("embedding"),
        (x, i) => x.cast("double") +
          sin(col("vec_id") * (i + lit(1))) * lit(0.05))).as("embedding"))
      .persist()
    val realIdx = s"${sys.props("java.io.tmpdir")}/graft_smoke_ivfpq_real"
    time("ivfpq_real_build_256c", nEmb) {
      V.saveIvfPqIndex(embR, "vec_id", "embedding", realIdx,
        clusters = 256, citers = 2, m = 8, dim = 64, ksub = 16,
        piters = 2, trainFilter = col("vec_id") % 50 === 0)
      graft.functions.SegmentedIndex.liveRows(spark, realIdx, "codes").count()
    }
    val exactReal = V.bruteForceTopK(
        embR.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec")),
        embR.select(col("vec_id").as("c_id"), col("embedding").as("c_vec")),
        "q_id", "c_id", "q_vec", "c_vec", k = 10)
      .select("q_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (nprobe <- Seq(8, 32)) {
      var hits = 0
      time(s"ivfpq_real_probe_np$nprobe", nEmb) {
        val got = V.ivfPqTopKFromIndex(realIdx, embR, "vec_id", "embedding",
            col("vec_id") < 10, m = 8, dim = 64, k = 10, shortlist = 2000,
            nprobe = nprobe)
          .select("q_id", "c_id").collect()
        hits = got.count(r => exactReal.contains((r.getLong(0), r.getLong(1))))
        got.length.toLong
      }
      println(f"SMOKE ivfpq_real_recall_np$nprobe recall@10=" +
        f"${hits.toDouble / exactReal.size}%.3f")
    }
    // int8 tier on the SAME perturbed corpus and query set, so the
    // quantized-index family reads as ONE comparable table (probe
    // latency + recall@10 next to the IVF-PQ nprobe sweep). int8 is
    // the honest quantized-brute-force baseline: a LINEAR scan of
    // 4×-smaller codes + exact re-rank of the shortlist — recall
    // should sit at ~1.0, and its probe latency is the number the
    // sub-linear tiers must beat as the corpus grows.
    val int8RealIdx = s"${sys.props("java.io.tmpdir")}/graft_smoke_int8_real"
    time("int8_real_build", nEmb) {
      V.saveInt8Index(embR, "vec_id", "embedding", int8RealIdx)
      V.int8Codes(spark, int8RealIdx).count()
    }
    var hits8 = 0
    time("int8_real_probe", nEmb) {
      val got = V.int8TopKFromIndex(int8RealIdx, embR, "vec_id", "embedding",
          col("vec_id") < 10, k = 10, shortlist = 2000)
        .select("q_id", "c_id").collect()
      hits8 = got.count(r => exactReal.contains((r.getLong(0), r.getLong(1))))
      got.length.toLong
    }
    println(f"SMOKE int8_real_recall recall@10=" +
      f"${hits8.toDouble / exactReal.size}%.3f")
    // IVF (√n cells, exact in-cell rank) and flat PQ (codes only, ADC
    // shortlist + exact re-rank) on the SAME corpus/queries complete
    // the four-tier comparison table: every tier's probe latency and
    // recall@10 measured under identical conditions.
    val ivfRealIdx = s"${sys.props("java.io.tmpdir")}/graft_smoke_ivf_real"
    time("ivf_real_build_256c", nEmb) {
      V.saveIvfIndex(embR, "vec_id", "embedding", ivfRealIdx,
        clusters = 256, iters = 2)
      graft.functions.SegmentedIndex.liveRows(spark, ivfRealIdx, "cells").count()
    }
    for (nprobe <- Seq(8, 32)) {
      var hitsI = 0
      time(s"ivf_real_probe_np$nprobe", nEmb) {
        val got = V.ivfTopKFromIndex(ivfRealIdx, embR, "vec_id", "embedding",
            col("vec_id") < 10, k = 10, nprobe = nprobe)
          .select("q_id", "c_id").collect()
        hitsI = got.count(r => exactReal.contains((r.getLong(0), r.getLong(1))))
        got.length.toLong
      }
      println(f"SMOKE ivf_real_recall_np$nprobe recall@10=" +
        f"${hitsI.toDouble / exactReal.size}%.3f")
    }
    val pqRealIdx = s"${sys.props("java.io.tmpdir")}/graft_smoke_pq_real"
    time("pq_real_build_m8", nEmb) {
      V.savePqIndex(embR, "vec_id", "embedding", pqRealIdx,
        m = 8, dim = 64, ksub = 16, iters = 2,
        trainFilter = col("vec_id") % 50 === 0)
      V.pqCodes(spark, pqRealIdx).count()
    }
    var hitsP = 0
    time("pq_real_probe", nEmb) {
      val got = V.pqTopKFromIndex(pqRealIdx, embR, "vec_id", "embedding",
          col("vec_id") < 10, m = 8, dim = 64, k = 10, shortlist = 2000)
        .select("q_id", "c_id").collect()
      hitsP = got.count(r => exactReal.contains((r.getLong(0), r.getLong(1))))
      got.length.toLong
    }
    println(f"SMOKE pq_real_recall recall@10=" +
      f"${hitsP.toDouble / exactReal.size}%.3f")

    // 16b6. blocked kNN GRAPH at the same 40× corpus — the all-vectors
    // twin of the query-batch tiers above: an exact graph here is
    // n² ≈ 6.4e9 pair scores; √n-scaled cells (256) at nprobe p score
    // ~p·n²/256, so the build should scale linearly with nprobe while
    // recall@10 (sampled on the same exactReal query set) climbs.
    // The graph is built for EVERY vector — out = n·k rows — which is
    // what an actual SemDeDup/cluster pass consumes.
    for (nprobe <- Seq(2, 8)) {
      var hitsG = 0
      time(s"knn_graph_blocked_np$nprobe", nEmb) {
        val g = V.knnGraphBlocked(embR, "vec_id", "embedding",
          k = 10, clusters = 256, iters = 2, nprobe = nprobe).persist()
        val n = g.count()
        val got = g.filter(col("q_id") < 10).select("q_id", "c_id").collect()
        hitsG = got.count(r => exactReal.contains((r.getLong(0), r.getLong(1))))
        g.unpersist(blocking = false)
        n
      }
      println(f"SMOKE knn_graph_recall_np$nprobe recall@10=" +
        f"${hitsG.toDouble / exactReal.size}%.3f")
    }
    embR.unpersist(blocking = false)

    // 16b5. int8 code-store lifecycle at 40×: codes persisted once
    // (no trained parameters — per-row quantization), probes answer
    // from the stored 4×-smaller scan, O(delta) merge is just code
    // rows + tombstones (the cheapest index maintenance in the family)
    val int8Idx = s"${sys.props("java.io.tmpdir")}/graft_smoke_int8"
    time("int8_index_build", nEmb) {
      V.saveInt8Index(embN.filter(col("vec_id") % 4 =!= 0),
        "vec_id", "embedding", int8Idx)
      V.int8Codes(spark, int8Idx).count()
    }
    time("int8_delta_merge", nEmb) {
      V.mergeInt8Delta(embN.filter(col("vec_id") % 4 === 0),
        "vec_id", "embedding", int8Idx)
      V.int8Codes(spark, int8Idx).count()
    }
    time("int8_query_indexed", nEmb) {
      V.int8TopKFromIndex(int8Idx, embN, "vec_id", "embedding",
        col("vec_id") < 10, k = 10, shortlist = 200).count()
    }

    // 16c. SemDeDup over the 40× embedding corpus: cells trained on a
    // 10% sample, the quadratic prune confined per cell; each base
    // vector's 40 identical replicas collapse toward the min id
    time("semantic_dedup", nEmb) {
      V.semanticDedup(emb, "vec_id", "embedding", clusters = 128, iters = 2,
        tau = 0.999, maxCell = 20000,
        trainFilter = col("vec_id") % 10 === 0).count()
    }
    // semanticPrune persists its cell assignment for the life of the
    // plan (documented contract); reclaim it so later sections measure
    // themselves, the same per-query hygiene Verify/Bench apply —
    // but re-pin the harness inputs the line above just evicted
    spark.catalog.clearCache()
    Seq(li, docs, emb, ev).foreach(_.persist().count())

    // 16d. ingest-time ANN probe: the 40× corpus "arrives" against the
    // persisted index of the base corpus — per-row literal-centroid
    // argmin (the streaming-legal form, no window) + cid equi-join
    val ingestIdx = s"${sys.props("java.io.tmpdir")}/graft_smoke_ingest_idx"
    val baseEmb = emb0.select(col("vec_id"), col("embedding"))
    time("ingest_probe", nEmb) {
      V.saveIvfIndex(baseEmb, "vec_id", "embedding", ingestIdx,
        clusters = 16, iters = 2)
      V.nearDupProbeIndex(ingestIdx, emb, "vec_id", "embedding", baseEmb,
        tau = 0.999).count()
    }

    // 16d2. IVF index lifecycle at 40×: build once on the %4!=0 slice,
    // then an O(delta) merge of the remaining quarter against the
    // FROZEN centroids (no re-train — the daily-ingest path), then the
    // query answering from the segmented tree. Build vs merge vs query
    // are separate rows so the operational cost (merge+query) is
    // visible against the one-time build.
    val ivfIncIdx = s"${sys.props("java.io.tmpdir")}/graft_smoke_ivf_inc"
    time("ivf_index_build", nEmb) {
      V.saveIvfIndex(emb.filter(col("vec_id") % 4 =!= 0), "vec_id", "embedding",
        ivfIncIdx, clusters = 16, iters = 2)
      V.ivfCells(spark, ivfIncIdx).count()
    }
    time("ivf_delta_merge", nEmb) {
      V.mergeIvfDelta(emb.filter(col("vec_id") % 4 === 0),
        "vec_id", "embedding", ivfIncIdx)
      V.ivfCells(spark, ivfIncIdx).count()
    }
    time("ivf_query_indexed", nEmb) {
      V.ivfTopKFromIndex(ivfIncIdx, emb, "vec_id", "embedding",
        col("vec_id") < 10, k = 10).count()
    }

    // 16e. hashed linear classifier margin over the 10× corpus: the
    // hashing-trick scoring pass is scan-side only — this row measures
    // the interpreted md5-per-token HOF cost (nativization candidate
    // if it ever dominates)
    time("classifier_margin", nDocs) {
      docs.select(T.hashedLinearScore(col("text"), T.pseudoWeights(64)).as("m"))
        .agg(sum(when(col("m") >= 0, 1L).otherwise(0L))).collect().head.getLong(0)
    }

    // 16f. epoch shard+rank over the 10× corpus: the training-export
    // shuffle ranks inside 256 shard partitions — never a global sort
    time("epoch_shard", nDocs) {
      graft.functions.Sampling.epochShard(docs.select("doc_id"), "doc_id",
          nShards = 256, epoch = 1)
        .agg(max("pos")).collect().head.getLong(0)
    }

    // 17. incremental dedup: batch vs corpus digest index at 10×
    time("incremental_dedup", nDocs) {
      graft.functions.DedupFunctions.incrementalExactDup(
        docs.filter(col("doc_id") % 10 =!= 7),
        docs.filter(col("doc_id") % 10 === 7),
        "doc_id", "text").filter(col("dup_in_corpus")).count()
    }

    // 18. z-order write + 2-D pruned readback over 6M events
    time("zorder_write_read", nEv) {
      val out = s"${sys.props("java.io.tmpdir")}/graft_smoke_zorder"
      val e = ev.select(col("event_id"), col("user_id"),
        floor(col("value") * 10).cast("long").as("vbucket"))
      graft.sources.Layout.writeZOrdered(e, out, "user_id", "vbucket", nFiles = 64)
      spark.read.parquet(out)
        .filter(col("user_id").between(100, 5000) && col("vbucket").between(2, 7))
        .count()
    }

    // 19. segmented BM25: full build vs O(delta) refresh at 600k docs
    val bmPath = s"${sys.props("java.io.tmpdir")}/graft_smoke_bm25"
    time("bm25_index_build", nDocs) {
      graft.functions.Curation.saveBm25Index(docs, "doc_id", "text", bmPath)
      graft.sources.ParquetMeta.rowCount(spark, s"$bmPath/segments/00000/doclen")
    }
    time("bm25_delta_merge", nDocs / 50) {
      // ~2% delta: half re-ingests existing ids (tombstone path), half new
      val delta = docs.filter(col("doc_id") % 100 === 0)
        .unionByName(docs.filter(col("doc_id") % 100 === 1)
          .withColumn("doc_id", col("doc_id") + 100000000L))
      graft.functions.Curation.mergeBm25Delta(delta, "doc_id", "text", bmPath)
      graft.sources.ParquetMeta.rowCount(spark, s"$bmPath/segments/00001/doclen")
    }
    time("bm25_query_indexed", nDocs) {
      graft.functions.Curation.bm25TopKFromIndex(spark, bmPath,
        Seq(0L -> Seq("spark", "window"), 1L -> Seq("hash", "merge", "vector")),
        k = 10).count()
    }
    // asOf snapshot read: same plan shape over FEWER segments — the
    // contract is "never slower than the live read at the same version"
    time("bm25_query_asof", nDocs) {
      graft.functions.Curation.bm25TopKFromIndex(spark, bmPath,
        Seq(0L -> Seq("spark", "window"), 1L -> Seq("hash", "merge", "vector")),
        k = 10, asOf = 0).count()
    }
    // footer-only introspection + cross-index pin: zero Spark jobs
    time("bm25_describe_and_pin", 2L) {
      val d = graft.functions.SegmentedIndex.describe(spark, bmPath, "doclen")
      graft.functions.CorpusSnapshot.write(spark,
        s"${sys.props("java.io.tmpdir")}/graft_smoke_pin.json",
        Map("bm25" -> bmPath))
      graft.functions.CorpusSnapshot.verify(spark,
        s"${sys.props("java.io.tmpdir")}/graft_smoke_pin.json")
      d.size.toLong
    }
    // DSIR selection at the full doc multiple: one token pass for the
    // bucket tables + a zero-shuffle literal-weight scoring scan
    time("dsir_select", nDocs) {
      graft.functions.Sampling.dsirSelect(docs, "doc_id", "text",
        col("lang") === "en", dims = 64, k = 1000).count()
    }

    // 20. perceptual-hash near-dup: PNG/WAV codec work per row (the
    // decode-bound profile), then the banded-Hamming join on 8-byte
    // hashes only — candidate volume grows with the boilerplate
    // residue clusters, bounded by the occupancy cap
    {
      import spark.implicits._
      val ids = docs.select(col("doc_id").cast("long")).as[Long]
        .repartition(spark.sparkContext.defaultParallelism)
      def png = ids.mapPartitions(it =>
        it.map(id => (id, graft.multimodal.ImageFixture.build(id)))).toDF("doc_id", "payload")
      time("image_phash", nDocs) {
        graft.multimodal.Multimodal.imagePHashes(png, "doc_id", "payload").count()
      }
      time("image_neardup", nDocs) {
        val hashes = graft.multimodal.Multimodal.imagePHashes(png, "doc_id", "payload")
        graft.multimodal.Multimodal.hammingNearDup(hashes, "doc_id", "phash",
          maxHamming = 10, maxBucket = 10000).count()
      }
      time("audio_neardup", nDocs) {
        val wav = ids.mapPartitions(it =>
          it.map(id => (id, graft.multimodal.AudioFixture.build(id)))).toDF("doc_id", "payload")
        val h = graft.multimodal.Multimodal.audioFingerprints(wav, "doc_id", "payload")
        graft.multimodal.Multimodal.hammingNearDup(h, "doc_id", "afp",
          maxHamming = 10, maxBucket = 10000).count()
      }
    }

    // 21. int8 ANN: integer-dot shortlist over the 40× corpus + exact
    // re-rank of shortlist rows only
    time("int8_topk", nEmb) {
      val q = embN.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val c = embN.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
      V.int8TopK(q, c, "q_id", "c_id", "q_vec", "c_vec", k = 10, shortlist = 40).count()
    }

    // 22. funnel over the scaled event stream: one shuffle on user_id,
    // O(1) per-user fold state
    time("funnel_conversion", nEv) {
      val tsMs = ev.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => col("ts") / lit(1000000L)
        case _ => unix_millis(col("ts").cast("timestamp"))
      }
      graft.operators.Funnel.conversion(ev.withColumn("ts_ms", tsMs),
        "user_id", "ts_ms", "event_type",
        Seq("view", "click", "signup", "purchase")).count()
    }

    // 23. token-window chunking: scan-side explode, write-amplified by
    // window/stride only
    time("chunk_windows", nDocs) {
      graft.functions.Curation.chunkByTokens(docs, "doc_id", "text",
        window = 40, stride = 32).count()
    }

    // r10: scan-shaped curation additions at 10× — URL canonicalization
    // (pure per-row regexp/array ops), epoch-repeat mixing (scan-side
    // explode, output volume = the requested mix), and span-level
    // decontamination scrub (broadcast eval gram hashes + positional
    // hit join + island cut)
    time("url_canonicalize", nDocs) {
      val url = concat(lit("HTTP://Www."), col("source"),
        lit(".COM:80/a/b?utm_source=feed&z=2&a=1#sec"))
      docs.select(graft.functions.UrlFunctions.canonicalizeUrl(url)
        .as("c")).count()
    }
    time("epoch_repeat_mix", nDocs) {
      graft.functions.Sampling.epochRepeat(
        docs.select("doc_id"), col("doc_id"), lit(25L)).count()
    }
    time("decontam_scrub", nDocs) {
      graft.functions.Curation.scrubContaminated(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", n = 5).count()
    }

    // r11: blocked bitext mining at 10× — the tier that exists BECAUSE
    // brute force is infeasible here (a 40k×40k cross-cosine pass each
    // direction); √n cells (256) at nprobe 16 score ~1/16 of the cross
    // pairs per direction, then the mutual-NN + decimal ratio-margin
    // tail runs over the two bounded top-4 lists
    time("bitext_mine_blocked", nEmb) {
      val aS = emb.filter(pmod(col("label"), lit(2)) === 0)
        .select(col("vec_id").as("a_id"), col("embedding").as("__av"))
      val bS = emb.filter(pmod(col("label"), lit(2)) === 1)
        .select(col("vec_id").as("b_id"), col("embedding").as("__bv"))
      val cents = V.kmeansCentroids(emb.select("vec_id", "embedding"),
        "vec_id", "embedding", k = 256, iters = 2)
      val topA = V.crossTopKBlocked(aS, bS, "a_id", "b_id", "__av", "__bv",
        k = 4, cents, nprobe = 16)
      val topB = V.crossTopKBlocked(bS, aS, "b_id", "a_id", "__bv", "__av",
        k = 4, cents, nprobe = 16)
      V.ratioMarginMine(topA, topB, k = 4).count()
    }

    // r11: per-benchmark contamination report at 10× — the composed
    // overlap + span rollup; eval grams broadcast as hashes, the
    // 50k-doc train side shuffles only matched (id, hash) rows
    time("decontam_report", nDocs) {
      val benchOf = concat(lit("b"),
        pmod(expr("doc_id div 97"), lit(3L)).cast("string"))
      val evalD = docs.filter(col("doc_id") % 97 === 0)
      val train = docs.filter(col("doc_id") % 97 =!= 0)
      val shc = graft.plans.ShingleHashExpr.shingleHashes(col("text"), 5)
      val bsh = evalD.select(benchOf.as("benchmark"), explode(shc).as("sh"))
        .distinct()
      val flagged = train.select(col("doc_id"), explode(shc).as("sh"))
        .join(broadcast(bsh), Seq("sh"))
        .groupBy("benchmark")
        .agg(countDistinct(col("doc_id")).as("n_train_flagged"))
      val spans = graft.functions.DedupFunctions.contaminationSpans(
          train, evalD, "doc_id", "text", n = 2, minSpanTokens = 3)
        .join(evalD.select(col("doc_id").as("eval_id"),
          benchOf.as("benchmark")), Seq("eval_id"))
        .groupBy("benchmark").agg(max("span_tokens").as("max_span"))
      flagged.join(spans, Seq("benchmark"), "full_outer").count()
    }

    // r12: MAINTAINED contamination report at 10× — the judge-grade
    // delta-vs-rebuild comparison: the stored state (base flagged
    // partial + base span pairs) refreshes from delta-sized jobs
    // (arrivals +1 / retractions −1 / span-pair anti-join) vs
    // re-shingling the whole survivor train side. The delta path's
    // cost tracks |delta∪dead|, not the archive.
    {
      val benchOf = concat(lit("b"),
        pmod(expr("doc_id div 97"), lit(3L)).cast("string"))
      val evalD = docs.filter(col("doc_id") % 97 === 0)
      val train = docs.filter(col("doc_id") % 97 =!= 0)
      val base  = train.filter(col("doc_id") % 10 =!= 7)
      val delta = train.filter(col("doc_id") % 10 === 7)
      val dead  = base.filter(col("doc_id") % 9 === 4)
      val shc = graft.plans.ShingleHashExpr.shingleHashes(col("text"), 5)
      val bsh = evalD.select(benchOf.as("benchmark"), explode(shc).as("sh"))
        .distinct().persist()
      bsh.count()
      def flaggedPairs(x: org.apache.spark.sql.DataFrame) =
        x.select(col("doc_id"), explode(shc).as("sh"))
          .join(broadcast(bsh), Seq("sh"))
          .select("benchmark", "doc_id").distinct()
      def spanPairs(x: org.apache.spark.sql.DataFrame) =
        graft.functions.DedupFunctions.contaminationSpans(
          x, evalD, "doc_id", "text", n = 2, minSpanTokens = 3)
      val A = graft.operators.AggMaintain
      // stored state, built once (the standing monitor's artifact)
      val pBase = A.partial(flaggedPairs(base), Seq("benchmark"), Map.empty, "n")
        .persist()
      val spBase = spanPairs(base).persist()
      pBase.count(); spBase.count()
      val nDelta = delta.count() + dead.count()
      time("decontam_maintain_delta", nDelta) {
        val pDelta = A.partial(flaggedPairs(delta), Seq("benchmark"), Map.empty, "n")
        val pDead = A.partial(flaggedPairs(dead), Seq("benchmark"), Map.empty, "n")
          .select(col("benchmark"), (col("n") * lit(-1L)).as("n"))
        val flagged = A.merge(Seq(pBase, pDelta, pDead),
          Seq("benchmark"), Seq("n")).filter(col("n") > 0)
        val spanTable = spBase
          .join(dead.select(col("doc_id")), Seq("doc_id"), "left_anti")
          .unionByName(spanPairs(delta))
        val spans = spanTable.groupBy("eval_id").agg(max("span_tokens"))
        flagged.count() + spans.count()
      }
      time("decontam_maintain_rebuild", nDocs) {
        val survivors = train.filter(col("doc_id") % 10 === 7 ||
          col("doc_id") % 9 =!= 4)
        val flagged = flaggedPairs(survivors).groupBy("benchmark")
          .agg(count(lit(1)).as("n"))
        val spans = spanPairs(survivors).groupBy("eval_id").agg(max("span_tokens"))
        flagged.count() + spans.count()
      }
      pBase.unpersist(); spBase.unpersist(); bsh.unpersist()
    }

    // ---- round-5: zipf mega-cluster skew sweep -----------------------
    // the web-corpus shape: ONE 10⁴-member near-dup cluster over a
    // distinct background. Each op also reports the max task
    // shuffle-read rows — the straggler number a wall clock hides.
    // per-stage task shuffle-read rows; the straggler signal is the max
    // task in a MULTI-task stage (a broadcast-relation build is one task
    // reading its whole input by design, bounded by the broadcast
    // threshold — not a straggler). Residual caveat: AQE coalescing can
    // still assign a whole tiny shuffle to one task — that max is
    // bounded by advisoryPartitionSizeInBytes, so it reads as "one
    // advisory-sized task", not a hub funnel.
    val stageReads = new scala.collection.concurrent.TrieMap[Int, List[Long]]()
    val skewListener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null && m.shuffleReadMetrics.recordsRead > 0)
          stageReads.updateWith(t.stageId) {
            case Some(l) => Some(m.shuffleReadMetrics.recordsRead :: l)
            case None    => Some(List(m.shuffleReadMetrics.recordsRead))
          }
      }
    }
    spark.sparkContext.addSparkListener(skewListener)
    def timeSkew(name: String, rows: Long)(f: => Long): Unit = {
      stageReads.clear()
      val t0 = System.nanoTime()
      val n = f
      Thread.sleep(300) // listener bus drains async
      val multi = stageReads.values.filter(_.size >= 2)
      val maxTask = if (multi.isEmpty) 0L else multi.map(_.max).max
      println(f"SMOKE $name%-28s in=$rows%9d out=$n%9d ${(System.nanoTime() - t0) / 1e9}%7.2f s max_task_rows=$maxTask%d")
    }

    // shrink AQE's advisory sizes: at smoke volumes the default 64 MB
    // target coalesces every shuffle into ONE partition, which would
    // make max_task_rows measure coalescing, not skew. Saved + restored
    // (and the listener removed) in the finally below so any section
    // added after this block runs under normal confs with un-double-
    // counted metrics.
    val savedAdvisory = spark.conf.getOption("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val savedMinPart = spark.conf.getOption("spark.sql.adaptive.coalescePartitions.minPartitionSize")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128k")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "32k")
    try {

    val megaN = 10000L
    val zipfDocs = spark.range(megaN)
      .select((col("id") + 900000000L).as("doc_id"),
        lit("the quick brown fox jumps over the lazy dog again and again").as("text"))
      .unionByName(docs0.select(col("doc_id"), col("text")))
      .persist()
    val nZipf = zipfDocs.count()
    val zToks = array_distinct(T.tokens(lower(col("text"))))

    // star edges stay LINEAR (≤ docs × bands) and the hub fans out
    // across salted reducer keys (hotThreshold below the cluster size)
    timeSkew("zipf_star_edges", nZipf) {
      graft.functions.DedupFunctions.lshBucketStarEdges(
        zipfDocs, "doc_id", zToks, k = 4, bands = 2, hotThreshold = 5000L).count()
    }
    timeSkew("zipf_cc_cluster", nZipf) {
      val edges = graft.functions.DedupFunctions.lshBucketStarEdges(
        zipfDocs, "doc_id", zToks, k = 4, bands = 2, hotThreshold = 5000L)
      graft.operators.ConnectedComponents.clusters(
        zipfDocs.select("doc_id"), "doc_id", edges, "id_a", "id_b",
        hotThreshold = 5000L).count()
    }
    // pairwise candidates with the bucket cap: the 10⁴ bucket (5·10⁷
    // pairs per band uncapped) is pruned from the quadratic path
    timeSkew("zipf_capped_pairs", nZipf) {
      graft.functions.DedupFunctions.lshCandidatePairs(
        zipfDocs, "doc_id", zToks, k = 4, bands = 2, maxBucket = 2000).count()
    }
    // r10: cross-doc paragraph dedup under the same mega-cluster — the
    // boilerplate segments appear in all 10⁴ cluster docs. The
    // winner-per-segment pass is a PARTIAL AGGREGATE
    // (groupBy(seg).min(struct(id, idx))): map-side combine collapses
    // each partition's copies of a hot segment to one candidate row
    // before the shuffle, so max_task_rows stays bounded by the
    // distinct-segment count — the pre-r10 window-rank plan sorted all
    // 10⁴ copies of each hot segment in ONE task.
    timeSkew("zipf_paragraph_dedup", nZipf) {
      graft.functions.Curation.dedupSegmentsAcross(
        zipfDocs, "doc_id", "text", " the ", minWords = 1).count()
    }

    // r10: keep-best exact dedup under the mega-cluster — the winner
    // per md5(text) digest is a partial aggregate (min(struct(-score,
    // id))), so the 10⁴-copy group combines map-side; the hot digest
    // still funnels its copies through the winner JOIN, which AQE can
    // skew-split (a window-rank plan could not be split at all)
    timeSkew("zipf_keep_best", nZipf) {
      graft.functions.DedupFunctions.dedupKeepBest(
        zipfDocs, "doc_id", "text",
        graft.functions.TextFunctions.qualityScore(col("text"))).count()
    }
    // r10: corpus-frequency boilerplate removal under the same shape —
    // df counting is distinct(seg, id) → per-seg count (both partial
    // aggregates), and the hot-set ANTI join prunes the 10⁴-doc
    // boilerplate segments from the stream
    timeSkew("zipf_boilerplate", nZipf) {
      graft.functions.Curation.removeFrequentSegments(
        zipfDocs, "doc_id", "text", " the ", minDocs = 5000L).count()
    }

    // embedding band join under the same shape: 10⁴ identical vectors
    // in one bucket, capped; background near-dups still verified
    val zipfEmb = spark.range(megaN)
      .select((col("id") + 900000000L).as("vec_id"),
        array((0 until 64).map(_ => lit(1.0f)): _*).as("embedding"))
      .unionByName(emb0.select(col("vec_id"), col("embedding")))
      .persist()
    val nZipfEmb = zipfEmb.count()
    timeSkew("zipf_banded_neardup", nZipfEmb) {
      V.bandedNearDup(zipfEmb, "vec_id", "embedding", bands = 3,
        bitsPerBand = 16, minCos = 0.95, maxBucket = 2000).count()
    }

    } finally {
      spark.sparkContext.removeSparkListener(skewListener)
      def restore(key: String, saved: Option[String]): Unit =
        saved.fold(spark.conf.unset(key))(v => spark.conf.set(key, v))
      restore("spark.sql.adaptive.advisoryPartitionSizeInBytes", savedAdvisory)
      restore("spark.sql.adaptive.coalescePartitions.minPartitionSize", savedMinPart)
    }

    spark.stop()
  }
}
