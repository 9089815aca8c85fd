package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.formats.CnaFormat
import graft.functions.{DedupFunctions, TextFunctions, VectorFunctions}
import graft.operators.{RangeJoin, Upsert, WindowOps}
import graft.rules.{RowRule, Rules}

/** Degenerate-input hardening: empty frames, null keys, empty arrays,
  * single-element domains — the shapes that show up constantly at the
  * edges of a 1000-file ingest.
  */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private val emptyKV = Seq.empty[(Int, String)].toDF("id", "v")

  test("battery on an empty frame reports zero violations, not failure") {
    val res = Rules.Battery.run(emptyKV,
      Seq(RowRule("v_null", "error", col("v").isNull, col("id"), "{count}")))
    assert(res.isValid)
    assert(res.findings.head.count == 0)
    assert(res.findings.head.example.isEmpty)
  }

  test("upsert with empty sides") {
    val data = Seq((1, "a")).toDF("id", "v")
    val d1 = Upsert.diff(data, emptyKV, Seq("id"))
    assert(d1.appends.count() == 1 && d1.updates.count() == 0 && d1.deletes.count() == 0)
    val d2 = Upsert.diff(emptyKV, data, Seq("id"))
    assert(d2.appends.count() == 0 && d2.deletes.count() == 1)
    val d3 = Upsert.diff(emptyKV, emptyKV, Seq("id"))
    assert(d3.appends.count() + d3.updates.count() + d3.deletes.count() == 0)
  }

  test("upsert with null PK values matches null-safely") {
    val in = Seq((Option.empty[Int], "x")).toDF("id", "v")
    val ex = Seq((Option.empty[Int], "x")).toDF("id", "v")
    val d = Upsert.diff(in, ex, Seq("id"))
    assert(d.appends.count() == 0 && d.updates.count() == 0 && d.deletes.count() == 0)
  }

  test("range join with empty interval side and degenerate intervals") {
    val pts = Seq(("1", 5L, 5L)).toDF("chrom", "s", "e")
    val none = Seq.empty[(String, Long, Long)].toDF("chrom", "rs", "re")
    assert(RangeJoin.binnedOverlap(pts, none, "chrom", "s", "e", "rs", "re", 10L).count() == 0)
    // zero-width interval exactly on a bin boundary
    val ivl = Seq(("1", 10L, 10L)).toDF("chrom", "rs", "re")
    val onBoundary = Seq(("1", 10L, 10L)).toDF("chrom", "s", "e")
    assert(RangeJoin.binnedOverlap(onBoundary, ivl, "chrom", "s", "e", "rs", "re", 10L).count() == 1)
  }

  test("overlapAuto picks a working strategy for small and large sides") {
    val pts = (1 to 100).map(i => ("1", i.toLong, i.toLong)).toDF("chrom", "s", "e")
    val ivl = Seq(("1", 10L, 20L)).toDF("chrom", "rs", "re")
    assert(RangeJoin.overlapAuto(pts, ivl, "chrom", "s", "e", "rs", "re").count() == 11)
    assert(RangeJoin.overlapAuto(pts, ivl, "chrom", "s", "e", "rs", "re",
      broadcastThreshold = 0L).count() == 11) // forced binned path
  }

  test("text/dedup functions on empty and single-token strings") {
    val df = Seq((1L, ""), (2L, "word"), (3L, "   ")).toDF("id", "text")
    val out = df.select(col("id"),
      TextFunctions.tokenCount(col("text")).as("n"),
      TextFunctions.langId(col("text")).as("lang"),
      DedupFunctions.simhash(TextFunctions.tokens(col("text")), 8).as("sh"),
      TextFunctions.shingles(col("text"), 3).as("sh3"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(2L).getAs[Long]("n") == 1L)
    assert(out(1L).getAs[String]("lang") == "und")
    assert(out.values.forall(_.getAs[Long]("sh") >= 0))
  }

  test("AdcDistance fails loudly on non-dense codebook shapes, zero codes sum to zero") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    def arr(xs: Seq[Double]) = ArrayData.toArrayData(xs.toArray)
    def codes(xs: Seq[Int]) = ArrayData.toArrayData(xs.toArray)
    // happy path: m=2, ksub=2, table [10,20,30,40] — codes (1,0) → 20+30
    assert(graft.plans.AdcDistance.compute(codes(Seq(1, 0)), arr(Seq(10, 20, 30, 40))) == 50.0)
    // empty codes: empty product space, distance 0
    assert(graft.plans.AdcDistance.compute(codes(Nil), arr(Seq(1.0))) == 0.0)
    // ragged table (5 entries for 2 codes) is a build bug, not data
    intercept[IllegalArgumentException] {
      graft.plans.AdcDistance.compute(codes(Seq(0, 1)), arr(Seq(1, 2, 3, 4, 5)))
    }
    // out-of-range code: dense-codebook contract violated
    intercept[IllegalArgumentException] {
      graft.plans.AdcDistance.compute(codes(Seq(0, 2)), arr(Seq(1, 2, 3, 4)))
    }
  }

  test("cosine of zero vector yields NaN (not crash) and topk excludes self") {
    val vecs = Seq((0L, Array(0f, 0f)), (1L, Array(1f, 0f)), (2L, Array(0f, 1f)))
      .toDF("id", "vec")
    val q = vecs.select(col("id").as("q_id"), col("vec").as("q_vec"))
    val c = vecs.select(col("id").as("c_id"), col("vec").as("c_vec"))
    val top = VectorFunctions.bruteForceTopK(q, c, "q_id", "c_id", "q_vec", "c_vec", 2)
    assert(top.filter(col("q_id") === col("c_id")).count() == 0)
    val z = top.filter(col("q_id") === 0).select("score").collect().map(_.getDouble(0))
    assert(z.forall(_.isNaN))
  }

  test("CNA melt of a single-sample matrix and empty pivot list") {
    val wide = Seq(("TP53", Some(1.0))).toDF("Hugo_Symbol", "S1")
    val long = CnaFormat.melt(wide)
    assert(long.count() == 1)
    val wideOut = CnaFormat.toWide(long, Seq("S1", "S_MISSING"))
    assert(wideOut.columns.toSeq == Seq("HUGO_SYMBOL", "S1", "S_MISSING"))
  }

  test("adjacent deltas with single-row groups emit null prev") {
    val df = Seq(("a", 1L, 1.0), ("b", 1L, 2.0)).toDF("k", "o", "v")
    val d = WindowOps.adjacentDeltas(df, Seq("k"), Seq("o"), Seq("v"))
    assert(d.filter(col("v_prev").isNull).count() == 2)
  }

  test("curation on null/empty text and empty frames") {
    import graft.functions.Curation
    val docs = Seq((1L, null.asInstanceOf[String]), (2L, "")).toDF("doc_id", "text")
    val out = Curation.curate(docs, "doc_id", "text", Seq("en"), 0.5)
      .select("doc_id", "keep").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // null/empty text → 'und' language → dropped, never a crash
    assert(out == Map(1L -> false, 2L -> false))
    assert(Curation.curate(docs.limit(0), "doc_id", "text", Seq("en"), 0.5).count() == 0)
  }

  test("packing: zero-token docs and empty shards") {
    import graft.functions.Curation
    val docs = Seq((1L, 0L, 0L), (2L, 0L, 0L), (3L, 1L, 5000L)).toDF("doc_id", "shard", "n_tokens")
    val packs = Curation.packByBudget(docs, "shard", "doc_id", "n_tokens", 100L)
      .select("doc_id", "pack_id").as[(Long, Long)].collect().toMap
    assert(packs(1L) == 0L && packs(2L) == 0L) // zero-width docs stay in pack 0
    assert(packs(3L) == 0L)                    // oversized doc still STARTS in pack 0
    assert(Curation.packByBudget(docs.limit(0), "shard", "doc_id", "n_tokens", 100L).count() == 0)
  }

  test("banded buckets beyond the vector length treat missing dims as one bucket") {
    import graft.functions.VectorFunctions
    // 4-dim vectors hashed with 2 bands × 4 bits: band 1 reads dims 5-8
    // (absent) → element_at null → every vector lands in band 1 bucket 0,
    // deterministically (documented degenerate case, not a crash)
    val df = Seq((1L, Array(1f, -1f, 1f, -1f)), (2L, Array(-1f, 1f, -1f, 1f)))
      .toDF("vec_id", "embedding")
    val keys = df.select(VectorFunctions.bandedSignBuckets(col("embedding"), 2, 4).as("ks"))
      .as[Seq[Long]].collect()
    assert(keys.forall(_.length == 2))
    assert(keys.map(_(1)).distinct.length == 1) // degenerate band: single bucket
  }

  test("gene matrix with empty cna/sv lists and empty clinical") {
    import graft.apps.ReleaseJob
    val clinical = Seq(("s1", "P1")).toDF("SAMPLE_ID", "SEQ_ASSAY_ID")
    val empty = clinical.limit(0).select("SAMPLE_ID")
    val m = ReleaseJob.geneMatrix(clinical, empty, empty)
      .collect().map(r => (r.getString(1), r.getString(2), r.getString(3)))
    assert(m.toSeq == Seq(("P1", "NA", "NA")))
    assert(ReleaseJob.geneMatrix(clinical.limit(0), empty, empty).count() == 0)
  }

  test("gopher signals on null, empty, and single-word text") {
    import graft.functions.TextFunctions
    val df = Seq((1L, null: String), (2L, ""), (3L, "word"),
      (4L, "aa bb cc dd")).toDF("id", "text")
    val g = TextFunctions.gopherSignals(col("text"))
    val rows = df.select(col("id"), g.getField("mean_word_len").as("mwl"),
        g.getField("alpha_word_frac").as("awf"), g.getField("keep").as("keep"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(rows(1L)._1.isEmpty && rows(1L)._3.isEmpty) // null text → null signals
    assert(rows(2L)._1.contains(0.0))                  // "" → one empty token, len 0
    assert(rows(3L)._1.contains(4.0) && rows(3L)._2.contains(1.0))
    assert(rows(4L)._1.contains(2.0) && rows(4L)._3.contains(false)) // mwl < 3 → drop
  }

  test("temperature mixing: single group gets min(1, target) rate; rates cap at 1") {
    import graft.functions.Sampling
    val one = (1 to 100).map(i => ("en", i.toLong)).toDF("lang", "doc_id")
    val r1 = Sampling.temperatureMixRates(one, "lang", targetFrac = 0.5)
      .as[(String, Long, Double)].collect()
    assert(r1.toSeq == Seq(("en", 100L, 0.5))) // single group → exactly targetFrac
    // tiny group's rate capped at 1.0, never oversampled
    val skewed = ((1 to 1000).map(i => ("big", i.toLong)) ++ Seq(("tiny", 9999L)))
      .toDF("lang", "doc_id")
    val rates = Sampling.temperatureMixRates(skewed, "lang", targetFrac = 0.8)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(rates("tiny") == 1.0, s"tiny group rate ${rates("tiny")} must cap at 1")
    assert(rates("big") < 1.0 && rates("big") > 0.0)
  }

  test("span containment from an empty index and winnow of empty docs") {
    import graft.functions.DedupFunctions
    val docs = Seq((1L, ""), (2L, "x")).toDF("doc_id", "text")
    // k=6 grams of sub-6-char docs → empty fingerprints → empty index
    val idx = DedupFunctions.winnowIndex(docs, "doc_id", "text", k = 6, w = 4)
    assert(idx.count() == 0)
    assert(DedupFunctions.spanContainmentFromIndex(idx, 50, 1L).count() == 0)
  }

  test("perceptual hashing: no decodable payloads, empty pair sets, constant images") {
    import graft.multimodal.Multimodal
    // a corpus where nothing decodes → zero hashes → zero pairs (no
    // stub hashes fabricating duplicate clusters)
    val junk = Seq((1L, "a".getBytes), (2L, Array.empty[Byte]))
      .toDF("id", "payload")
    val hashes = Multimodal.imagePHashes(junk, "id", "payload")
    assert(hashes.count() == 0)
    assert(Multimodal.hammingNearDup(hashes, "id", "phash").count() == 0)
    // two constant-color images: every cell equals the mean → hash 0
    // for both → a legitimate hamming-0 pair (boilerplate shape)
    def flat(v: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 16).foreach(y => (0 until 16).foreach(x =>
        img.setRGB(x, y, (v << 16) | (v << 8) | v)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val flats = Seq((1L, flat(30)), (2L, flat(200))).toDF("id", "payload")
    val fp = Multimodal.imagePHashes(flats, "id", "payload")
    val pairs = Multimodal.hammingNearDup(fp, "id", "phash", maxHamming = 0)
      .collect()
    assert(pairs.length == 1 && pairs.head.getLong(2) == 0L)
  }

  test("funnel and chunking on empty/degenerate inputs") {
    val noSteps = Seq((1L, 5L, "other")).toDF("user_id", "ts_ms", "event_type")
    assert(graft.operators.Funnel.conversion(noSteps, "user_id", "ts_ms",
      "event_type", Seq("view", "click")).collect()
      .forall(_.getLong(2) == 0L))
    val empty = spark.emptyDataFrame
      .withColumn("user_id", lit(1L)).withColumn("ts_ms", lit(1L))
      .withColumn("event_type", lit("view")).limit(0)
    assert(graft.operators.Funnel.userSlots(empty, "user_id", "ts_ms",
      "event_type", Seq("view")).count() == 0)
    // chunking: empty text is one empty-token chunk; whitespace-only trims
    val chunks = graft.functions.Curation.chunkByTokens(
        Seq((1L, ""), (2L, "   ")).toDF("id", "text"), "id", "text",
        window = 4, stride = 4)
      .select("id", "chunk_idx", "n_tokens")
      .as[(Long, Long, Long)].collect().toSet
    assert(chunks == Set((1L, 0L, 1L), (2L, 0L, 1L)))
  }

  test("dsirSelect: guard rails and degenerate corpora") {
    val docs = Seq((1L, "alpha beta", "t"), (2L, "gamma delta", "b"),
      (3L, null.asInstanceOf[String], "b")).toDF("doc_id", "text", "grp")
    // invalid params and an empty target slice fail loudly
    intercept[IllegalArgumentException] {
      graft.functions.Sampling.dsirSelect(docs, "doc_id", "text",
        col("grp") === "t", dims = 0, k = 5)
    }
    intercept[IllegalArgumentException] {
      graft.functions.Sampling.dsirSelect(docs, "doc_id", "text",
        col("grp") === "zzz", dims = 8, k = 5)
    }
    // null-text docs score null and are excluded from the selection
    // (TopKAggregate skips null scores); k > corpus returns everyone else
    val sel = graft.functions.Sampling.dsirSelect(docs, "doc_id", "text",
        col("grp") === "t", dims = 8, k = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(sel == Set(1L, 2L))
  }

  test("bigramLmScore: guard rails and degenerate corpora") {
    import graft.functions.{TextFunctions => T}
    val docs = Seq((1L, "alpha beta gamma"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    // invalid params fail loudly
    intercept[IllegalArgumentException] {
      T.bigramLmScore(docs, "doc_id", "text", vocabK = 0)
    }
    intercept[IllegalArgumentException] {
      T.bigramLmScore(docs, "doc_id", "text", alpha = 0.0)
    }
    // a trainFilter matching nothing: empty vocab, every token <unk>,
    // every pair scores through the unseen-context constant
    // ln(alpha/(alpha*(vocabK+1))) = ln(1/(vocabK+1)) — the denominator
    // is always sized by the CONFIGURED vocabK, not the realized vocab
    val out = T.bigramLmScore(docs, "doc_id", "text", vocabK = 4,
        trainFilter = lit(false))
      .as[(Long, Long, Double)].collect()
    assert(out.length == 1 && out.head._1 == 1L && out.head._2 == 2L)
    val expected = BigDecimal(math.log(0.5 / (0.5 * 5)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out.head._3 - expected) < 1e-9,
      s"expected the unseen-context constant $expected, got ${out.head._3}")
  }

  test("repeatedSpans / blocklist / knnGraph degenerate corpora") {
    import graft.functions.Curation
    // a corpus with zero repeats: span report empty, removal is the
    // identity (modulo normalization)
    val unique = Seq((1L, "aa bb cc dd ee"), (2L, "ff gg hh ii jj"))
      .toDF("doc_id", "text")
    assert(DedupFunctions.repeatedSpanStats(unique, "doc_id", "text",
      n = 3, minCount = 2L).isEmpty)
    val cleaned = DedupFunctions.removeRepeatedSpans(unique, "doc_id", "text",
        n = 3, minCount = 2L)
      .as[(Long, String)].collect().toMap
    assert(cleaned == Map(1L -> "aa bb cc dd ee", 2L -> "ff gg hh ii jj"))
    // empty-text docs: duplicates of the empty whole-doc gram cover
    // their single empty token; no crash, stats stay honest
    val empties = Seq((1L, ""), (2L, ""), (3L, "xx yy zz ww vv")).toDF("doc_id", "text")
    val es = DedupFunctions.repeatedSpanStats(empties, "doc_id", "text",
        n = 3, minCount = 2L)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(es == Seq((1L, 1L, 1L, 1L, 1L), (2L, 1L, 1L, 1L, 1L)), s"got $es")

    // blocklist: phrase absent everywhere -> empty, not an error; a
    // phrase LONGER than every doc can't match
    assert(Curation.blocklistHits(unique, "doc_id", "text",
      Seq("not here at all", "aa bb cc dd ee ff gg")).isEmpty)

    // knnGraph with k exceeding the candidate count: lists shorten,
    // nobody pairs with themselves
    val vecs = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f)))
      .toDF("id", "vec")
    val g = VectorFunctions.knnGraph(vecs, "id", "vec", k = 5)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSeq
    assert(g.toSet == Set((1L, 2L), (2L, 1L)))
  }
}
