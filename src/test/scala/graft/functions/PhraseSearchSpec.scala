package graft.functions

import graft.SparkSpec

class PhraseSearchSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "a b a b a"),        // overlapping phrase starts
    (1L, "A  B   a"),         // case + multi-space normalization
    (2L, "b b b"),            // phrase terms present, order wrong for "a b"
    (3L, "x y z a"),          // phrase at doc end
    (4L, "")                  // empty doc
  ).toDF("doc_id", "text")

  test("phrase occurrences count overlapping starts") {
    val out = PhraseSearch.phraseSearch(docs, "doc_id", "text",
      Seq(0L -> Seq("a", "b", "a")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // "a b a b a": starts 0 and 2 both match a-b-a; "A  B   a"
    // normalizes to [a, b, a] and matches once
    assert(out.toSeq == Seq((0L, 0L, 2L), (0L, 1L, 1L)))
  }

  test("tokenization is lowercased whitespace-split") {
    val out = PhraseSearch.phraseSearch(docs, "doc_id", "text",
      Seq(7L -> Seq("a", "b")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 0: starts 0, 2; doc 1: "A  B" normalizes to a b
    assert(out.toSeq == Seq((7L, 0L, 2L), (7L, 1L, 1L)))
  }

  test("wrong order and absent terms do not match") {
    val out = PhraseSearch.phraseSearch(docs, "doc_id", "text",
      Seq(0L -> Seq("b", "a"), 1L -> Seq("a", "q")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // "b a" matches docs 0 (starts 1, 3) and 1 ("B a"); "a q" nowhere
    assert(out.toSeq == Seq((0L, 0L, 2L), (0L, 1L, 1L)))
  }

  test("single-token phrase degenerates to term frequency") {
    val out = PhraseSearch.phraseSearch(docs, "doc_id", "text",
      Seq(0L -> Seq("b")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((0L, 0L, 2L), (0L, 1L, 1L), (0L, 2L, 3L)))
  }

  test("phrase longer than the document never matches") {
    val out = PhraseSearch.phraseSearch(
      Seq((0L, "a b")).toDF("doc_id", "text"), "doc_id", "text",
      Seq(0L -> Seq("a", "b", "a")))
    assert(out.count() == 0L)
  }

  test("proximity counts position pairs within the window, inclusive") {
    val d = Seq(
      (0L, "x . . . y"),      // |0-4| = 4
      (1L, "x . . . . y"),    // |0-5| = 5 > 4
      (2L, "x y x"),          // pairs (0,1) and (2,1)
      (3L, "y . x")           // order-free: |2-0| = 2
    ).toDF("doc_id", "text")
    val out = PhraseSearch.proximitySearch(d, "doc_id", "text",
      Seq((0L, "x", "y")), window = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((0L, 0L, 1L), (0L, 2L, 2L), (0L, 3L, 1L)))
  }

  test("proximity requires both terms") {
    val d = Seq((0L, "x x x"), (1L, "y")).toDF("doc_id", "text")
    val out = PhraseSearch.proximitySearch(d, "doc_id", "text",
      Seq((0L, "x", "y")), window = 10)
    assert(out.count() == 0L)
  }

  test("persisted index answers match the scan-side pass bit for bit") {
    val path = tmpDir("phrase_idx")
    PhraseSearch.savePositionalIndex(docs, "doc_id", "text", path)
    val phrases = Seq(0L -> Seq("a", "b"), 1L -> Seq("b"))
    val fromIdx = PhraseSearch.phraseSearchFromIndex(spark, path, phrases)
      .collect().toSeq
    val fromScan = PhraseSearch.phraseSearch(docs, "doc_id", "text", phrases)
      .collect().toSeq
    assert(fromIdx == fromScan)
    val pairs = Seq((0L, "a", "b"))
    assert(
      PhraseSearch.proximitySearchFromIndex(spark, path, pairs, 2)
        .collect().toSeq ==
        PhraseSearch.proximitySearch(docs, "doc_id", "text", pairs, 2)
          .collect().toSeq)
  }

  test("delta merge replaces, deletes, and supports asOf") {
    val path = tmpDir("phrase_inc")
    PhraseSearch.savePositionalIndex(docs, "doc_id", "text", path)
    // doc 0 re-ingested without the phrase; doc 3 deleted (null text)
    val delta = Seq(
      (0L, Option("c c c")),
      (3L, Option.empty[String])
    ).toDF("doc_id", "text")
    PhraseSearch.mergePositionalDelta(delta, "doc_id", "text", path)

    val phrases = Seq(0L -> Seq("a", "b"), 1L -> Seq("c"), 2L -> Seq("a"))
    val latest = Seq(
      (1L, "A  B   a"), (2L, "b b b"), (4L, ""), (0L, "c c c")
    ).toDF("doc_id", "text")
    assert(
      PhraseSearch.phraseSearchFromIndex(spark, path, phrases)
        .collect().toSeq ==
        PhraseSearch.phraseSearch(latest, "doc_id", "text", phrases)
          .collect().toSeq)
    // asOf segment 0: the pre-merge corpus answers
    assert(
      PhraseSearch.phraseSearchFromIndex(spark, path, phrases, asOf = 0)
        .collect().toSeq ==
        PhraseSearch.phraseSearch(docs, "doc_id", "text", phrases)
          .collect().toSeq)
  }

  test("compaction folds segments without changing answers") {
    val path = tmpDir("phrase_compact")
    PhraseSearch.savePositionalIndex(docs, "doc_id", "text", path)
    PhraseSearch.mergePositionalDelta(
      Seq((0L, "c c c")).toDF("doc_id", "text"), "doc_id", "text", path)
    PhraseSearch.mergePositionalDelta(
      Seq((5L, "a b fresh")).toDF("doc_id", "text"), "doc_id", "text", path)
    val phrases = Seq(0L -> Seq("a", "b"), 1L -> Seq("c"))
    val before = PhraseSearch.phraseSearchFromIndex(spark, path, phrases)
      .collect().toSeq
    PhraseSearch.compactPositionalIndex(spark, path)
    assert(SegmentedIndex.segmentDirs(spark, path).map(_._1) == Seq(0))
    assert(PhraseSearch.phraseSearchFromIndex(spark, path, phrases)
      .collect().toSeq == before)
  }

  test("retraction purges a document from every query") {
    val path = tmpDir("phrase_retract")
    PhraseSearch.savePositionalIndex(docs, "doc_id", "text", path)
    PhraseSearch.retractPositional(spark, path, Seq(0L).toDF("doc_id"))
    val out = PhraseSearch.phraseSearchFromIndex(spark, path,
        Seq(0L -> Seq("a", "b"), 1L -> Seq("b")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(!out.exists(_._2 == 0L), s"retracted doc 0 still matches: ${out.toSeq}")
    assert(out.nonEmpty)
    // retracting an unknown id is a no-op, not an error
    PhraseSearch.retractPositional(spark, path, Seq(99L).toDF("doc_id"))
  }

  test("parameter guards") {
    intercept[IllegalArgumentException] {
      PhraseSearch.phraseSearch(docs, "doc_id", "text", Seq(0L -> Seq()))
    }
    intercept[IllegalArgumentException] {
      PhraseSearch.proximitySearch(docs, "doc_id", "text",
        Seq((0L, "same", "SAME")), window = 3)
    }
    intercept[IllegalArgumentException] {
      PhraseSearch.proximitySearch(docs, "doc_id", "text",
        Seq((0L, "a", "b")), window = 0)
    }
  }
}
