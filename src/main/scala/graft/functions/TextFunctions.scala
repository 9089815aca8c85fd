package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for large-scale training-data pipelines.
  *
  * All of these are pure Catalyst `Column` expressions (codegen'd,
  * whole-stage-friendly, no UDFs) so they survive a 100 TB scan: the
  * work is per-row, embarrassingly parallel, and never forces a shuffle.
  *
  * Reference analog: the rule/string library of the Genie pipeline
  * (process_functions.py:183-324, transform.py:11-29) generalized to
  * document-corpus operations.
  */
object TextFunctions {

  /** Whitespace tokenization; trim first so no empty edge tokens. */
  def tokens(text: Column): Column =
    split(trim(text), "\\s+")

  def tokenCount(text: Column): Column =
    // one native pass (graft.plans.TokenGramStatsExpr) — identical count
    // to size(tokens(text)) (property-tested Spark-split semantics)
    // without materializing the token array
    graft.plans.TokenGramStatsExpr.stats(text, 2).getField("n_tok")

  /** BPE-ish subword count: word-chars runs, digits, and punctuation
    * each count as a token (a cheap proxy for byte-pair encoding used
    * to budget LLM training tokens without a vocab file).
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /** Hashing-trick linear classifier margin (fastText-style quality
    * scoring): every lowercased token hashes into one of
    * `weights.length` buckets (first 8 md5 hex chars — the same
    * engine-portable scheme as `Sampling.hashBucket`) and the margin
    * is `bias + Σ weights(bucket)` over tokens in document order. The
    * learned weight vector ships as a LITERAL array inside the plan
    * (a few KB), so scoring a 100 TB corpus is one scan-side pass —
    * no shuffle, no join, no UDF. Sigmoid is monotone, so
    * thresholding the margin ≡ thresholding the probability; keeping
    * the margin avoids cross-engine `exp()` last-ulp drift.
    */
  def hashedLinearScore(text: Column, weights: Seq[Double],
                        bias: Double = 0.0, salt: String = "feat"): Column = {
    require(weights.nonEmpty, "weights must be non-empty")
    val warr = array(weights.map(lit): _*)
    val b = weights.length
    val bucket = (t: Column) =>
      (conv(substring(md5(concat(lit(salt + ":"), t)), 1, 8), 16, 10)
        .cast("long") % b).cast("int")
    aggregate(
      filter(tokens(lower(text)), t => length(t) > lit(0)),
      lit(bias),
      (acc, t) => acc + element_at(warr, bucket(t) + 1))
  }

  /** Deterministic stand-in weight vector for specs/demos: a Knuth
    * multiplicative mix of the bucket index into [-1, 1). A real
    * pipeline passes trained weights instead; the formula exists so an
    * oracle can regenerate the identical vector bit-for-bit.
    */
  def pseudoWeights(n: Int): Seq[Double] =
    (0 until n).map(i =>
      ((i * 2654435761L) % 4294967296L).toDouble / 4294967296.0 * 2.0 - 1.0)

  /** TRAIN the hashing-trick linear model in-engine — the missing half
    * of [[hashedLinearScore]] (which only scores): deterministic
    * full-batch gradient descent on squared loss over hashed
    * bag-of-words counts,
    * `w ← w − lr · Σᵢ xᵢ(xᵢ·w − yᵢ) / n`, `iters` fixed steps from
    * w = 0.
    *
    * Features are per-doc TERM FREQUENCIES (bucket count / doc token
    * count), not raw counts: ‖x‖₁ = 1 bounds ‖x‖² ≤ 1, so the GD
    * contraction condition lr·λmax < 2 holds for lr ≤ 2 on ANY corpus
    * — raw counts make λmax grow with document length and a fixed lr
    * diverge on long docs.
    *
    * Scale shape: the (doc, bucket, tf) feature rows materialize
    * ONCE (persisted for the loop) — the corpus is tokenized once, and
    * each GD step is two map-side-combined aggregations whose shuffles
    * carry ≤ dims·partitions partial sums, plus a dims-row collect.
    * The weight vector is driver-small by construction (dims doubles)
    * and broadcasts back each step, exactly the [[graft.functions.VectorFunctions.kmeansCentroids]]
    * loop discipline.
    *
    * Determinism (oracle-replayable): per-doc predictions and per-
    * bucket gradients both sum through DECIMAL(30,10) (partial-agg
    * order can't change them); the driver-side update runs the same
    * `w − lr·(g/n)` IEEE expression DuckDB replays; squared loss keeps
    * the whole computation polynomial — no exp(), no cross-engine
    * last-ulp drift. Docs whose text yields no tokens still count in
    * `n` (their zero feature vector contributes nothing to gradients).
    */
  def trainHashedLinearWeights(docs: org.apache.spark.sql.DataFrame,
                               idCol: String, textCol: String, label: Column,
                               dims: Int, lr: Double, iters: Int,
                               salt: String = "feat"): Seq[Double] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bucket = (t: Column) =>
      (conv(substring(md5(concat(lit(salt + ":"), t)), 1, 8), 16, 10)
        .cast("long") % dims).cast("int")
    val counts = docs
      .select(col(idCol).as("__id"), label.cast("double").as("__y"),
        explode(filter(tokens(lower(col(textCol))), t => length(t) > lit(0))).as("__t"))
      .select(col("__id"), col("__y"), bucket(col("__t")).as("__b"))
      .groupBy("__id", "__y", "__b").agg(count(lit(1)).as("__c"))
    val lens = counts.groupBy("__id").agg(sum("__c").as("__l"))
    val feat = counts.join(lens, Seq("__id"))
      .select(col("__id"), col("__y"), col("__b"),
        (col("__c").cast("double") / col("__l").cast("double")).as("__x"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = docs.count()
      var w: IndexedSeq[Double] = IndexedSeq.fill(dims)(0.0)
      for (_ <- 0 until iters) {
        val wdf = w.zipWithIndex.map { case (wj, j) => (j, wj) }.toDF("__b", "__w")
        val err = feat.join(broadcast(wdf), Seq("__b"))
          .groupBy("__id", "__y")
          .agg(sum((col("__x") * col("__w")).cast("decimal(30,10)"))
            .cast("double").as("__p"))
          .select(col("__id"), (col("__p") - col("__y")).as("__e"))
        val grads = feat.join(err, Seq("__id"))
          .groupBy("__b")
          .agg(sum((col("__x") * col("__e")).cast("decimal(30,10)"))
            .cast("double").as("__g"))
          .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
        w = (0 until dims).map { j =>
          w(j) - lr * (grads.getOrElse(j, 0.0) / n.toDouble)
        }
      }
      w
    } finally feat.unpersist(blocking = false)
  }

  /** Stopword sets per language for the n-gram/stopword language-ID
    * heuristic. Deliberately tiny + deterministic.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "a", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "una"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une"),
    "de" -> Seq("der", "die", "und", "das", "von", "zu", "mit", "ein")
  )

  /** Fraction of tokens that are in `words` (case-insensitive). */
  def stopwordRatio(text: Column, words: Seq[String]): Column = {
    val toks = tokens(lower(text))
    val hits = size(filter(toks, t => t.isInCollection(words)))
    hits.cast("double") / greatest(size(toks), lit(1)).cast("double")
  }

  /** Language-ID: argmax over per-language stopword hit counts;
    * "und" (undetermined) when nothing matches. Delegates to the native
    * one-pass expression (graft.plans.LangIdExpr); the composed-column
    * form below exists to prove decision-rule equality in specs.
    */
  def langId(text: Column): Column =
    graft.plans.LangIdExpr.langId(tokens(lower(text)))

  /** Composed-expression twin of [[langId]] (one interpreted array pass
    * per language) — kept as the reference semantics oracle.
    */
  def langIdComposed(text: Column): Column = {
    val toks = tokens(lower(text))
    val scored = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(size(filter(toks, t => t.isInCollection(words))).as("hits"), lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Quality score in [0,1]: blend of length saturation, alpha ratio and
    * word-length sanity — the usual cheap pre-filters before expensive
    * dedup/teacher scoring at corpus scale.
    */
  def qualityScore(text: Column): Column = {
    // one fused native pass supplies the token count AND the alpha-space
    // char count (== length(regexp_replace(text, '[^A-Za-z ]', '')) —
    // the regex form allocated a scrubbed copy of every document)
    val st        = graft.plans.TokenGramStatsExpr.stats(text, 2)
    val len       = length(text).cast("double")
    val lenScore  = least(len / lit(500.0), lit(1.0))
    val alpha     = st.getField("n_alpha_space_chars").cast("double") /
      greatest(len, lit(1.0))
    val nTok      = st.getField("n_tok").cast("double")
    val avgWord   = len / greatest(nTok, lit(1.0))
    val wordScore = when(avgWord.between(3.0, 12.0), lit(1.0)).otherwise(lit(0.5))
    round((lenScore * lit(0.4) + alpha * lit(0.4) + wordScore * lit(0.2)), 6)
  }

  /** Content-defined document fingerprint: md5 over the sorted distinct
    * token set. Identical modulo token order/multiplicity — the standard
    * "bag fingerprint" for clustering boilerplate variants.
    */
  /** Learn `iters` BPE merge rules in-engine — the tokenizer-TRAINING
    * step of a data pipeline, in the shape real trainers use
    * (HuggingFace tokenizers): pair statistics aggregate over distinct
    * WORD TYPES weighted by corpus frequency, so after ONE corpus scan
    * (the word-count table) every iteration is a vocabulary-sized
    * groupBy plus a 1-row argmax collect. Each word is a
    * space-delimited symbol sequence with sentinel spaces; applying a
    * merge is a literal `replace(" l r " → " lr ")`, whose
    * left-to-right non-overlap semantics are identical across engines
    * (and to the greedy BPE apply rule), so the DuckDB oracle replays
    * training step for step. Ties break (freq desc, left, right) —
    * binary collation both sides.
    *
    * Returns (step, l_tok, r_tok, freq) — one row per learned merge.
    */
  def learnBpeMerges(docs: org.apache.spark.sql.DataFrame, textCol: String,
                     iters: Int): org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    val words = docs
      .select(explode(split(trim(lower(col(textCol))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("wc"))
    val chars = transform(sequence(lit(1), length(col("w"))),
      i => col("w").substr(i, lit(1)))
    var vocab = words
      .select(concat(lit(" "), array_join(chars, " "), lit(" ")).as("seq"),
        col("wc"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    try {
      var step = 1
      var done = false
      while (step <= iters && !done) {
        val toks = split(trim(col("seq")), " ")
        val pairs = explode(zip_with(
          slice(toks, lit(1), size(toks) - 1), slice(toks, lit(2), size(toks) - 1),
          (l, r) => struct(l.as("l"), r.as("r"))))
        val top = vocab.select(pairs.as("p"), col("wc"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum("wc").as("freq"))
          .orderBy(col("freq").desc, col("l"), col("r"))
          .limit(1).collect()
        if (top.isEmpty) done = true
        else {
          val (l, r, f) = (top.head.getString(0), top.head.getString(1),
            top.head.getLong(2))
          merges += ((step, l, r, f))
          val next = vocab
            .withColumn("seq", replace(col("seq"),
              lit(s" $l $r "), lit(s" $l$r ")))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          next.count() // materialize before dropping the parent
          vocab.unpersist(blocking = false)
          vocab = next
          step += 1
        }
      }
    } finally vocab.unpersist(blocking = false)
    import spark.implicits._
    merges.toSeq.toDF("step", "l_tok", "r_tok", "freq")
      .select(col("step").cast("long").as("step"), col("l_tok"),
        col("r_tok"), col("freq"))
  }

  /** APPLY learned BPE merges: per-document token count after running
    * the merge list (in learned order) over each word's symbol
    * sequence — the greedy left-to-right apply rule, expressed as the
    * same sentinel-space literal replaces the trainer uses, so
    * train/apply semantics are identical by construction. Pure
    * scan-side expression (merge list is driver-small and folds into
    * the plan); at billion-doc scale the word-TYPE token table from
    * training broadcast-joins instead of re-merging per occurrence —
    * same answers, amortized work.
    */
  def bpeTokenCount(text: Column, merges: Seq[(String, String)]): Column = {
    val words = filter(split(trim(lower(text)), "\\s+"), w => length(w) > 0)
    val perWord = transform(words, w => {
      val chars = transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1)))
      val seq0 = concat(lit(" "), array_join(chars, " "), lit(" "))
      val merged = merges.foldLeft(seq0) { case (s, (l, r)) =>
        replace(s, lit(s" $l $r "), lit(s" $l$r "))
      }
      size(split(trim(merged), " ")).cast("long")
    })
    aggregate(perWord, lit(0L), (a, x) => a + x)
  }

  /** Unicode canonicalization for dedup keys (NFC + lowercase +
    * punctuation fold + whitespace collapse) — native codegen'd
    * [[graft.plans.NormalizeTextExpr]], DuckDB-replayable.
    */
  def normalizeText(text: Column, stripPunct: Boolean = true): Column =
    graft.plans.NormalizeTextExpr.normalizeText(text, stripPunct)

  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(lower(text)))), " "))

  /** Winnowing fingerprint (rolling k-gram hash + window minima — the
    * MOSS scheme): every window of `w` consecutive k-gram hashes
    * contributes its minimum, so two documents sharing a run of ≥ w+k-1
    * characters share a selected hash, while only ~1/w of positions are
    * kept. Returns the sorted distinct selected hashes.
    *
    * Delegates to the codegen'd [[graft.plans.WinnowExpr]] — one O(n)
    * rolling pass per row (the composed HOF form re-evaluates subtrees
    * per element and goes O(n³); see the expression's scaladoc for the
    * engine-portability rules the oracle replays).
    */
  def winnowHashes(text: Column, k: Int, w: Int): Column =
    graft.plans.WinnowExpr.winnow(text, k, w)

  /** Word n-gram (shingle) array, space-joined shingles of size n. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(lower(text))
    val idx  = sequence(lit(0), greatest(size(toks) - n, lit(0)))
    when(size(toks) >= n,
      array_distinct(transform(idx, i => array_join(slice(toks, i + 1, lit(n)), " ")))
    ).otherwise(array(array_join(toks, " ")))
  }

  /** Fraction of tokens taken by the single most frequent token — the
    * Gopher-style "repetition" quality signal (a doc that is 40% the
    * same word is boilerplate). Pure per-row expression, zero shuffle.
    */
  def topTokenFraction(text: Column): Column = {
    // native one-pass stats (graft.plans.TokenGramStatsExpr) — the HOF
    // form filtered the token array once per distinct token. n=2 so a
    // paired dupNgramFraction(text, 2) shares the subexpression.
    val st = graft.plans.TokenGramStatsExpr.stats(text, 2)
    round(coalesce(st.getField("max_tok_count").cast("double"), lit(0.0)) /
      coalesce(st.getField("n_tok").cast("double"), lit(1.0)), 6)
  }

  /** Fraction of duplicated n-grams: 1 − distinct/total. High values
    * mean the doc repeats itself (C4/Gopher repetition filters drop
    * docs above ~0.3 for 2-grams). Pure per-row expression.
    */
  def dupNgramFraction(text: Column, n: Int): Column = {
    // native one-pass gram counting (rolling hash, counts identical to
    // the gram-string form the oracle replays); null text → 0.0 like
    // the HOF form it replaces
    val st = graft.plans.TokenGramStatsExpr.stats(text, n)
    round(when(coalesce(st.getField("n_grams"), lit(0L)) === 0, lit(0.0))
      .otherwise(lit(1.0) -
        st.getField("n_distinct_grams").cast("double") /
          st.getField("n_grams").cast("double")), 6)
  }

  /** Gopher-style document quality signals (Rae et al. 2021 §A1.1),
    * one struct per row:
    *   - mean_word_len      sum(token chars)/n_tok — Gopher keeps [3,10]
    *   - alpha_word_frac    words containing ≥1 [a-z] — keeps > 0.8
    *   - symbol_word_ratio  '#' chars + '...' runs per word — keeps <0.1
    *   - bullet_line_frac   lines starting - or * — keeps < 0.9
    *   - ellipsis_line_frac lines ending "..." — keeps < 0.3
    *   - keep               the conjunction of the five thresholds
    * Word stats ride the native one-pass
    * [[graft.plans.TokenGramStatsExpr]]; line signals split on literal
    * newlines (documents have few lines — cheap HOFs). All ratios are
    * integer-count divisions rounded to 6 dp, so the oracle replays
    * them exactly. Scan-side at any scale, zero shuffle.
    */
  def gopherSignals(text: Column): Column = {
    val st = graft.plans.TokenGramStatsExpr.stats(text, 2)
    val nTok = st.getField("n_tok").cast("double")
    val meanWordLen = round(st.getField("sum_tok_len").cast("double") / nTok, 6)
    val alphaFrac = round(st.getField("n_alpha_words").cast("double") / nTok, 6)
    // '#' count + '...' occurrence count via length deltas (portable)
    val hashCnt = length(text) - length(regexp_replace(text, "#", ""))
    val dotsCnt = (length(text) - length(regexp_replace(text, "\\.\\.\\.", ""))) / 3
    val symbolRatio = round((hashCnt + dotsCnt).cast("double") / nTok, 6)
    val lines = split(text, "\n", -1)
    val nLines = size(lines).cast("double")
    val bulletFrac = round(size(filter(lines,
      l => l.startsWith("-") || l.startsWith("*"))).cast("double") / nLines, 6)
    val ellipsisFrac = round(size(filter(lines,
      l => l.endsWith("..."))).cast("double") / nLines, 6)
    val keep = meanWordLen.between(3.0, 10.0) && alphaFrac > 0.8 &&
      symbolRatio < 0.1 && bulletFrac < 0.9 && ellipsisFrac < 0.3
    struct(meanWordLen.as("mean_word_len"), alphaFrac.as("alpha_word_frac"),
      symbolRatio.as("symbol_word_ratio"), bulletFrac.as("bullet_line_frac"),
      ellipsisFrac.as("ellipsis_line_frac"), keep.as("keep"))
  }

  /** PII patterns restricted to syntax valid in BOTH Java regex and
    * RE2 (no lookaround, no backreferences) so the DuckDB oracle can
    * replay the scrub byte-for-byte.
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val phonePattern = "\\b\\d{3}-\\d{4}\\b"

  /** PII scrub: emails, IPv4s, and phone-shaped tokens replaced with
    * typed placeholders. Emails first (they can contain digit runs the
    * later patterns would mangle), then IPs, then phones. Pure per-row
    * regexp_replace chain — scrubbing 100 TB stays a scan-side map with
    * zero shuffle.
    */
  def scrubPii(text: Column): Column = {
    val noEmail = regexp_replace(text, emailPattern, "<EMAIL>")
    val noIp    = regexp_replace(noEmail, ipv4Pattern, "<IP>")
    regexp_replace(noIp, phonePattern, "<PHONE>")
  }

  /** Per-type PII hit counts on the raw text (pre-scrub), for audit
    * reports and drop-threshold policies.
    */
  def piiCounts(text: Column): Column = struct(
    regexp_count(text, lit(emailPattern)).cast("long").as("n_emails"),
    regexp_count(text, lit(ipv4Pattern)).cast("long").as("n_ips"),
    regexp_count(text, lit(phonePattern)).cast("long").as("n_phones"))

  /** Bigram language-model quality score — the CCNet-style "LM
    * perplexity" filter: train an add-α-smoothed bigram LM on the
    * corpus itself (top-`vocabK` tokens + `<unk>`), score each doc by
    * its mean log P(wᵢ | wᵢ₋₁). Low scores flag boilerplate/gibberish
    * the unigram quality signals miss.
    *
    * Shape (the DSIR discipline): TWO training aggregations — unigram
    * counts → the vocabulary, then bigram counts over vocab-mapped
    * tokens (≤ (vocabK+1)² rows, driver-collected; context counts
    * derive from the same table with no extra job) — and the
    * per-bigram log-probs ship as LITERAL maps into a zero-shuffle
    * scoring scan (per-doc left fold in document order; each entry
    * pre-rounded to 6 dp so both engines sum identical doubles).
    * `vocabK` is HARD-CAPPED at 4096: the implementation
    * driver-collects the bigram table and plans (vocabK+1)²-entry
    * literal maps, which is honest up to a few-thousand-token vocab
    * (≤ ~16.8M map entries at the cap is already the outer limit of a
    * sane plan; typical CCNet-style use is 10²-10³). A larger
    * vocabulary needs a different physical shape — explode tokens to
    * (prev, cur) pairs and broadcast-JOIN the bigram table instead of
    * shipping it as a literal — which this function deliberately does
    * NOT silently switch to, because the scoring fold's in-document
    * sequential order (and hence the 6-dp-rounded sum the oracle
    * replays) is the contract here.
    * Docs with fewer than two tokens have no bigrams and are omitted.
    * Token separator in map keys is a space — impossible inside a
    * whitespace-split token.
    */
  def bigramLmScore(docs: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String, vocabK: Int = 64,
                    alpha: Double = 0.5,
                    trainFilter: Column = lit(true)): org.apache.spark.sql.DataFrame = {
    // literal-map-honest vocab bound (see scaladoc): the bigram table
    // is driver-collected and shipped as typedLit maps, so vocabK is
    // capped where that physical shape stays sane; larger vocabularies
    // need the broadcast-join shape instead
    require(vocabK >= 1 && vocabK <= 4096,
      s"vocabK must be in [1, 4096] (bigram table ships as a literal " +
        s"map; use a broadcast-join scoring shape beyond that), got $vocabK")
    require(alpha > 0.0 && java.lang.Double.isFinite(alpha),
      s"alpha must be finite and > 0 (smoothing divides by it), got $alpha")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = filter(tokens(lower(col(textCol))), t => length(t) > lit(0))
    // widen once: tokenization, the vocab map and the per-pair literal
    // lookups are interpreted HOFs — CPU-dense per text byte, so a
    // byte-small corpus must not run them on one scan task (Fan.widen
    // is the identity at scale). The scoring fold itself stays an
    // in-row document-order aggregate — partitioning cannot change it.
    val based = graft.core.Fan.widen(docs.filter(col(textCol).isNotNull))
    // the true CCNet shape: `trainFilter` picks the reference-domain
    // slice the LM trains on (e.g. a known-clean subcorpus); the WHOLE
    // corpus is then scored against that model. Default trains on
    // everything (self-perplexity).
    val trainDocs = based.filter(trainFilter)
    // vocabulary: top-K tokens by (count desc, token asc) — the
    // deterministic tie-break both engines replay
    val vocab = trainDocs
      .select(explode(toks).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__w").asc)
      .limit(vocabK)
      .select("__w").as[String].collect().toSeq
    val vMap = typedLit(vocab.map(w => w -> w).toMap)
    def mapped = transform(toks, w => coalesce(element_at(vMap, w), lit("<unk>")))
    // bigram counts over mapped adjacent pairs; contexts derive from
    // the SAME table (Σ_b c(a,b)) so training is exactly two jobs
    val m = trainDocs
      .select(mapped.as("__m")).filter(size(col("__m")) >= 2)
    val bigrams = m
      .select(explode(zip_with(
        slice(col("__m"), lit(1), size(col("__m")) - 1),
        slice(col("__m"), lit(2), size(col("__m")) - 1),
        (a, b) => concat(a, lit(" "), b))).as("__p"))
      .groupBy("__p").agg(count(lit(1)).as("__c"))
      .as[(String, Long)].collect()
    // the vocabK cap bounds the WORST case; this bounds the ACTUAL
    // driver state and plan size — observed bigrams on a diverse corpus
    // can approach (vocabK+1)² long before vocabK looks large
    require(bigrams.length <= 200000,
      s"observed bigram table has ${bigrams.length} entries — too large " +
        "to ship as a literal map; reduce vocabK or use a broadcast-join " +
        "scoring shape")
    val ctxCount: Map[String, Long] = bigrams
      .groupBy(_._1.split(" ", 2)(0)).view.mapValues(_.map(_._2).sum).toMap
    val denomK = alpha * (vocabK + 1)
    def lp6(num: Double, den: Double): Double =
      BigDecimal(math.log(num / den))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val bigramLp: Map[String, Double] = bigrams.map { case (p, c) =>
      val cc = ctxCount(p.split(" ", 2)(0))
      p -> lp6(c + alpha, cc + denomK)
    }.toMap
    val ctxLp: Map[String, Double] =
      ctxCount.map { case (a, cc) => a -> lp6(alpha, cc + denomK) }
    val unseenCtxLp = lp6(alpha, denomK) // context never seen: ln(1/(V+1))
    val bMap = typedLit(bigramLp)
    val cMap = typedLit(ctxLp)
    based
      .select(col(idCol), mapped.as("__m"))
      .filter(size(col("__m")) >= 2)
      .select(col(idCol),
        zip_with(
          slice(col("__m"), lit(1), size(col("__m")) - 1),
          slice(col("__m"), lit(2), size(col("__m")) - 1),
          (a, b) => coalesce(
            element_at(bMap, concat(a, lit(" "), b)),
            element_at(cMap, a),
            lit(unseenCtxLp))).as("__lp"))
      .select(col(idCol),
        size(col("__lp")).cast("long").as("n_pairs"),
        round(aggregate(col("__lp"), lit(0.0), (acc, x) => acc + x) /
          size(col("__lp")).cast("double"), 6).as("lm_score"))
  }

  /** [[bigramLmScore]]'s JOIN-shaped sibling for vocabularies past the
    * literal-map cap: the vocab / bigram / context tables stay
    * DataFrames end-to-end (nothing driver-collected, nothing shipped
    * as a literal), pairs explode scan-side from each doc's token
    * array, and scoring is three joins — token→vocab (twice, mapping
    * out-of-vocab to `<unk>`), pair→bigram log-prob, context→fallback
    * log-prob — followed by ONE per-doc aggregation. Catalyst picks
    * broadcast joins while the tables fit and falls back to shuffle
    * joins beyond that, which is exactly the scale behavior the
    * literal shape cannot have.
    *
    * The price of order-free distribution is the fold: the literal
    * variant sums log-probs in document order (its cross-engine
    * contract), while this one sums the SAME 6-dp-rounded entries
    * through DECIMAL(30,6) so partial-aggregation order cannot change
    * the result — the two variants agree to the last bit whenever the
    * double fold happens not to round differently, but their contracts
    * are deliberately separate. Same training semantics: top-`vocabK`
    * tokens by (count desc, token asc), add-α smoothing, `trainFilter`
    * picks the reference slice, docs with < 2 tokens are omitted.
    */
  def bigramLmScoreJoined(docs: org.apache.spark.sql.DataFrame, idCol: String,
                          textCol: String, vocabK: Int = 64,
                          alpha: Double = 0.5,
                          trainFilter: Column = lit(true)): org.apache.spark.sql.DataFrame = {
    // 2^20 bound: the vocab rides a TakeOrderedAndProject + broadcast,
    // honest far beyond the literal-map cap, and keeps vocabK+1 inside
    // Int for the smoothing denominator
    require(vocabK >= 1 && vocabK <= (1 << 20),
      s"vocabK must be in [1, ${1 << 20}], got $vocabK")
    require(alpha > 0.0 && java.lang.Double.isFinite(alpha),
      s"alpha must be finite and > 0 (smoothing divides by it), got $alpha")
    val toks = filter(tokens(lower(col(textCol))), t => length(t) > lit(0))
    // widen once (see bigramLmScore): tokenize + pair explode are
    // CPU-dense per text byte; the DECIMAL per-doc sum is order-free
    val based = graft.core.Fan.widen(docs.filter(col(textCol).isNotNull))
    val trainDocs = based.filter(trainFilter)
    val vocab = trainDocs
      .select(explode(toks).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__w").asc)
      .limit(vocabK)
      .select("__w")
    // raw adjacent pairs, exploded scan-side (the token arrays never
    // shuffle — only (id, pair) rows move, and only into partial aggs)
    def pairsOf(d: org.apache.spark.sql.DataFrame) = d
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("__id"), toks.as("__t"))
      .filter(size(col("__t")) >= 2)
      .select(col("__id"), explode(zip_with(
        slice(col("__t"), lit(1), size(col("__t")) - 1),
        slice(col("__t"), lit(2), size(col("__t")) - 1),
        (a, b) => struct(a.as("ra"), b.as("rb")))).as("__p"))
      .select(col("__id"), col("__p.ra").as("__ra"), col("__p.rb").as("__rb"))
    // vocab-map both slots via joins (left: misses become <unk>)
    def mapped(p: org.apache.spark.sql.DataFrame) = p
      .join(vocab.select(col("__w").as("__ra"), col("__w").as("__va")),
        Seq("__ra"), "left")
      .join(vocab.select(col("__w").as("__rb"), col("__w").as("__vb")),
        Seq("__rb"), "left")
      .select(col("__id"), coalesce(col("__va"), lit("<unk>")).as("__a"),
        coalesce(col("__vb"), lit("<unk>")).as("__b"))
    val denomK = alpha * (vocabK + 1)
    val bg = mapped(pairsOf(trainDocs))
      .groupBy("__a", "__b").agg(count(lit(1)).as("__bc"))
    val ctx = bg.groupBy("__a").agg(sum("__bc").as("__cc"))
    // 6-dp log-probs computed WHERE THE ROWS ARE (same Math.log +
    // HALF_UP round the literal variant applies on the driver)
    val bgLp = bg.join(ctx, "__a").select(col("__a"), col("__b"),
      round(log((col("__bc") + lit(alpha)) / (col("__cc") + lit(denomK))), 6)
        .as("__blp"))
    val ctxLp = ctx.select(col("__a"),
      round(log(lit(alpha) / (col("__cc") + lit(denomK))), 6).as("__clp"))
    val unseenCtxLp = BigDecimal(math.log(alpha / denomK))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    mapped(pairsOf(based))
      .join(bgLp, Seq("__a", "__b"), "left")
      .join(ctxLp, Seq("__a"), "left")
      .select(col("__id"),
        coalesce(col("__blp"), col("__clp"), lit(unseenCtxLp)).as("__lp"))
      .groupBy(col("__id").as(idCol))
      .agg(count(lit(1)).as("n_pairs"),
        round(sum(col("__lp").cast(org.apache.spark.sql.types.DecimalType(30, 6)))
          .cast("double") / count(lit(1)).cast("double"), 6).as("lm_score"))
  }

  /** Zipf's-law slope per group: fit `ln(freq) = slope·ln(rank) + b`
    * by least squares over each group's `topN` most frequent tokens
    * (count-desc, token tie-break). Natural corpora sit near −1; a
    * slope far from it is the classic screen for machine-generated or
    * boilerplate-heavy sources.
    *
    * Scale shape: one (group, token) count aggregation (map-side
    * combined), a topN row-number window per group, then a
    * group-cardinality-sized regression — the corpus is touched once.
    * Determinism: each ln term is rounded to 6 dp and the four
    * regression sums fold in rank order over a sorted per-group array,
    * so an external engine replays every double bit-for-bit (same
    * discipline as [[hashedLinearScore]]'s ordered dot product); the
    * slope itself rounds to 6 dp.
    */
  def zipfSlope(docs: org.apache.spark.sql.DataFrame, groupCol: String,
                textCol: String, topN: Int): org.apache.spark.sql.DataFrame = {
    require(topN >= 2, "zipfSlope: need topN >= 2")
    import org.apache.spark.sql.expressions.Window
    val toks = explode(filter(tokens(lower(col(textCol))),
      t => length(t) > lit(0)))
    val counts = docs.select(col(groupCol), toks.as("__tok"))
      .groupBy(groupCol, "__tok").agg(count(lit(1)).as("__cnt"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__cnt").desc, col("__tok").asc)
    val ranked = counts.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= topN)
    val terms = ranked.groupBy(groupCol).agg(
      sort_array(collect_list(struct(
        col("__rank").as("r"),
        round(log(col("__rank").cast("double")), 6).as("lx"),
        round(log(col("__cnt").cast("double")), 6).as("ly")))).as("__ts"))
    def fsum(f: Column => Column): Column =
      aggregate(col("__ts"), lit(0.0), (acc, x) => acc + f(x))
    val n = size(col("__ts")).cast("double")
    val sx = fsum(_.getField("lx"))
    val sy = fsum(_.getField("ly"))
    val sxy = fsum(x => x.getField("lx") * x.getField("ly"))
    val sxx = fsum(x => x.getField("lx") * x.getField("lx"))
    terms
      .filter(size(col("__ts")) >= 2)
      .select(col(groupCol),
        size(col("__ts")).cast("long").as("n_toks"),
        round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6).as("slope"))
  }
}
