package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation composites: the per-document decisions a training-data
  * pipeline makes before tokenization, expressed as single-pass Spark
  * plans over the `documents`-shaped tables.
  */
object Curation {

  /** One-pass keep/drop decision: language filter, quality floor, exact
    * dedup (first id per md5(text) wins). The only exchange is the dedup
    * hash shuffle on the 128-bit digest; language-ID and quality are
    * codegen'd per-row expressions. Reason precedence mirrors the usual
    * pipeline order: lang → quality → exact_dup.
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             keepLangs: Seq[String], minQuality: Double): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol).asc)
    docs
      .withColumn("lang_pred", TextFunctions.langId(col(textCol)))
      .withColumn("quality", TextFunctions.qualityScore(col(textCol)))
      .withColumn("__dup_rank", row_number().over(w))
      .withColumn("drop_reason",
        // null-safe: null text → null lang/quality must DROP, not leak
        // through three-valued logic as keep
        when(!coalesce(col("lang_pred").isInCollection(keepLangs), lit(false)), lit("lang"))
          .when(coalesce(col("quality") < minQuality, lit(true)), lit("quality"))
          .when(col("__dup_rank") > 1, lit("exact_dup"))
          .otherwise(lit(null).cast("string")))
      .withColumn("keep", col("drop_reason").isNull)
      .drop("__dup_rank")
  }

  /** Sequence packing by contiguous fill ("concat-then-chunk", the
    * GPT-style packing pass): within each shard, documents in a total
    * order accumulate tokens and a document's pack is the budget window
    * it STARTS in — boundary docs overflow into the next pack exactly
    * like real concat-packing.
    *
    * Sharding is what makes this 100 TB-safe: the running sum is a
    * window per shard, so packing parallelizes across shards instead of
    * serializing the corpus through one global window.
    */
  def packByBudget(docs: DataFrame, shardCol: String, orderCol: String,
                   tokensCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.withColumn("__cum", sum(col(tokensCol)).over(w))
      .withColumn("pack_id",
        floor((col("__cum") - col(tokensCol)) / lit(budget.toDouble)).cast("long"))
      .drop("__cum")
  }

  /** Top-k TF-IDF terms per document. Corpus shape, not per-row:
    * document frequencies come from an explode + token-keyed count
    * (shuffle carries (doc_id, token) pairs only), IDF is a vocab-sized
    * table broadcast back, ranking is a per-doc window. At 100 TB the
    * vocab table is the only thing that must fit in memory — the corpus
    * streams through.
    *
    * tfidf = (count/doc_len) · ln(n_docs/doc_freq), rounded to 6 dp
    * BEFORE ranking so rank order is engine-portable (ties broken by
    * token).
    */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    val tok = docs.select(col(idCol),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("token"))
    val cnt = tok.groupBy(col(idCol), col("token")).agg(count(lit(1)).as("c"))
    val docLen = cnt.groupBy(col(idCol)).agg(sum("c").as("n_tok"))
    val nDocs = docs.select(countDistinct(col(idCol)).as("n_docs"))
    val docFreq = cnt.groupBy("token").agg(count(lit(1)).as("doc_freq"))
    val idf = docFreq.crossJoin(broadcast(nDocs))
      .select(col("token"),
        log(col("n_docs").cast("double") / col("doc_freq").cast("double")).as("idf"))
    // docLen is corpus-sized (one row per doc) → ordinary shuffle join;
    // only the vocab-sized idf table gets broadcast
    val scored = cnt
      .join(docLen, Seq(idCol))
      .join(broadcast(idf), Seq("token"))
      .withColumn("tfidf",
        round((col("c").cast("double") / col("n_tok").cast("double")) * col("idf"), 6))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("token"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("token"), col("tfidf"), col("rank"))
  }

  /** Corpus-frequency rarity signals — the integer-exact core of a
    * perplexity-style quality score, without the float-log portability
    * risk. Per document:
    *   - `n_tok`      whitespace tokens;
    *   - `oov_frac`   fraction of tokens outside the top-`vocabK`
    *                  corpus vocabulary (high → gibberish / rare-script
    *                  text, the usual LM-quality drop signal);
    *   - `mean_tok_freq` mean corpus frequency of the doc's tokens
    *                  (low → rare/unnatural tokens; the -log of this is
    *                  a unigram surprisal proxy).
    * Plan shape at 100 TB: one token-count aggregation (map-side
    * combined, vocabulary-sized result), the top-K vocab is driver-small
    * and broadcast; the corpus token stream joins the vocabulary-sized
    * frequency table on an equi-key. All stats are integer sums divided
    * once at the end — no partial-agg order sensitivity.
    */
  def rarityStats(docs: DataFrame, idCol: String, textCol: String,
                  vocabK: Int): DataFrame = {
    val tok = docs.select(col(idCol),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("token"))
    // per-(doc, token) counts first: shrinks the join input to distinct
    // tokens per doc and makes the final per-doc agg a second map-side
    // combine over the same key
    val cnt = tok.groupBy(col(idCol), col("token")).agg(count(lit(1)).as("c"))
    val freq = cnt.groupBy("token")
      .agg(sum("c").as("corpus_freq"), count(lit(1)).as("doc_freq"))
    // deterministic vocabulary: top-K by (freq desc, token asc)
    val vocab = freq
      .orderBy(col("corpus_freq").desc, col("token").asc).limit(vocabK)
      .select(col("token"), lit(1).as("__in_vocab"))
    val scored = cnt
      .join(freq.select("token", "corpus_freq"), Seq("token"))
      .join(broadcast(vocab), Seq("token"), "left")
    scored.groupBy(col(idCol))
      .agg(sum("c").as("n_tok"),
        sum(when(col("__in_vocab").isNull, col("c")).otherwise(lit(0L))).as("__oov"),
        sum(col("c") * col("corpus_freq")).as("__freq_sum"))
      .select(col(idCol), col("n_tok"),
        round(col("__oov").cast("double") / col("n_tok").cast("double"), 6)
          .as("oov_frac"),
        round(col("__freq_sum").cast("double") / col("n_tok").cast("double"), 6)
          .as("mean_tok_freq"))
  }

  /** C4-style segment filter: split a document on a literal separator,
    * keep only segments with at least `minWords` whitespace-words
    * (C4 drops lines under 5 words / without terminal punctuation —
    * same shape, separator-parameterized). Trailing empty segments are
    * KEPT by the split (limit −1) so the oracle's non-regex splitter
    * sees the same segment list. Returns the kept-segment array; pure
    * per-row expression, zero shuffle at any scale.
    */
  def keepSegments(text: Column, sep: String, minWords: Int): Column = {
    val segs = split(text, java.util.regex.Pattern.quote(sep), -1)
    filter(segs, s => size(split(s, " ", -1)) >= minWords)
  }

  /** Segment array for the same split (for n_segments-style stats). */
  def segments(text: Column, sep: String): Column =
    split(text, java.util.regex.Pattern.quote(sep), -1)

  /** Intra-document duplicate-segment REMOVAL (the C4 "discard
    * duplicate three-sentence spans" cleaning step, separator-
    * parameterized): keep each segment's FIRST occurrence in order,
    * rejoin. `array_distinct` preserves first-occurrence order, so
    * this is a pure per-row expression — cleaning 100 TB is a scan.
    */
  def dropDuplicateSegments(text: Column, sep: String): Column =
    array_join(array_distinct(segments(text, sep)), sep)
}
