package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic sampling / data-mixing operators for training-data
  * pipelines: reproducible splits, per-stratum rate sampling, per-group
  * top-k, and token-budget selection.
  *
  * Everything here is hash-derived from the row's own id — NO
  * `rand()`, no seed state, no driver round-trips — so a 100 TB run
  * re-executed after a task failure (or next month, on a different
  * cluster layout) assigns every document to the same split. Hashes
  * are md5-based so any engine can reproduce the assignment
  * bit-for-bit.
  */
object Sampling {

  /** 32-bit deterministic bucket in [0, 2³²) from a salted id: the
    * first 8 hex chars of md5("salt:id"). Pure per-row expression —
    * computed inside the scan, never shuffles.
    */
  def hashBucket(id: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt + ":"), id.cast("string"))), 1, 8), 16, 10)
      .cast("long")

  /** Exact `floor(num / den)` over non-negative Long columns, for ANY
    * Long magnitude: operands are cast to DECIMAL(38,0), the remainder
    * is subtracted (decimal pmod is exact), and the division of an
    * exact multiple by its divisor is an integer the result type
    * represents exactly — so the result carries no floating-point
    * sensitivity at any scale, unlike `floor(numDouble / denDouble)`
    * whose 1-ulp drift can flip an acceptance-threshold boundary (or
    * the earlier double-trick form, exact only below 2⁵³).
    * Cross-engine contracts (mixture rates, hash-Bernoulli thresholds)
    * should derive every cut-off through this, keeping DOUBLE out of
    * the comparison path entirely.
    */
  def longFloorDiv(num: Column, den: Column): Column = {
    val dec = DecimalType(38, 0)
    val (n, d) = (num.cast(dec), den.cast(dec))
    ((n - pmod(n, d)) / d).cast("long")
  }

  /** Exact half-up `round(num / den)` for non-negative Longs:
    * `floor((2·num + den) / (2·den))`, computed in DECIMAL so
    * `2·num + den` cannot overflow for any Long inputs — the
    * parts-per-million form of a rate replaces a `round(double, 6)`
    * output column with a BIGINT that every engine reproduces
    * bit-for-bit. For ppm rates over corpus-sized sums, prefer
    * [[ppmHalfUp]], which also keeps the ·10⁶ scaling out of Long.
    */
  def longDivHalfUp(num: Column, den: Column): Column = {
    val dec = DecimalType(38, 0)
    val (n, d) = (num.cast(dec), den.cast(dec))
    val (n2, d2) = (n * lit(2) + d, d * lit(2))
    ((n2 - pmod(n2, d2)) / d2).cast("long")
  }

  /** Exact half-up parts-per-million `round(num·10⁶ / den)` with the
    * ·10⁶ scaling done in DECIMAL: at 100 TB, per-group char/gram sums
    * reach ~10¹³, so `sum * 1_000_000L` in Long arithmetic silently
    * wraps past 2⁶³ — every ppm call site should pass the RAW sum here
    * instead of pre-multiplying.
    */
  def ppmHalfUp(num: Column, den: Column): Column =
    longDivHalfUp(num.cast(DecimalType(38, 0)) * lit(1000000), den)

  /** DSIR-style data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): rank every corpus
    * document by the importance ratio of a TARGET slice's hashed
    * unigram distribution vs the full corpus's, keep the top `k`.
    * Per document:
    *   log w(d) = Σ_tokens [ ln p̂_T(b(t)) − ln p̂_C(b(t)) ]
    * over the same md5 feature buckets as
    * [[TextFunctions.hashedLinearScore]], with add-α smoothing
    * p̂(b) = (n_b + α)/(N + α·dims). High log w ⇒ the document looks
    * like the target domain; selection = deterministic top-k (DSIR's
    * Gumbel resampling swaps in per-id hash noise — composition with
    * [[weightedSampleWoR]] — but the ranked form is the reproducible
    * default).
    *
    * Scale shape: ONE token pass builds both bucket tables (dims-sized
    * aggregation, map-side combined); the log-ratio vector is
    * driver-computed (dims doubles, rounded to 6 dp for engine
    * portability) and ships as a literal inside the scoring scan —
    * scoring 100 TB is a zero-shuffle pass, and the selection is the
    * k-bounded top-k aggregate, never a full sort.
    */
  def dsirSelect(docs: DataFrame, idCol: String, textCol: String,
                 targetFilter: Column, dims: Int, k: Int,
                 alpha: Double = 1.0, salt: String = "feat"): DataFrame = {
    require(dims > 0 && k > 0, "need dims > 0 and k > 0")
    val bucket = (t: Column) =>
      (conv(substring(md5(concat(lit(salt + ":"), t)), 1, 8), 16, 10)
        .cast("long") % dims).cast("int")
    val counts = docs
      .select(targetFilter.as("__is_t"),
        explode(filter(TextFunctions.tokens(lower(col(textCol))),
          t => length(t) > lit(0))).as("__t"))
      .select(col("__is_t"), bucket(col("__t")).as("__b"))
      .groupBy("__b").agg(count(lit(1)).as("n_c"),
        sum(when(col("__is_t"), 1L).otherwise(0L)).as("n_t"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val totC = counts.values.map(_._1).sum.toDouble
    val totT = counts.values.map(_._2).sum.toDouble
    require(totT > 0, "target slice has no tokens")
    val w = (0 until dims).map { b =>
      val (nc, nt) = counts.getOrElse(b, (0L, 0L))
      val lw = math.log((nt + alpha) / (totT + alpha * dims)) -
        math.log((nc + alpha) / (totC + alpha * dims))
      // HALF_UP at 6 dp: the exact ROUND(x, 6) the oracle replays
      BigDecimal(lw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val scored = docs.select(col(idCol),
      round(TextFunctions.hashedLinearScore(col(textCol), w, 0.0, salt), 6)
        .as("__lw"))
    graft.plans.TopKAggregate
      .topKExploded(scored, Seq.empty, col("__lw"), col(idCol), k)
      .select(col("id").as(idCol), col("score").as("log_w"), col("rank"))
  }

  /** Epoch-repeat mixing — the "dataset X for 2.5 epochs" recipe shape
    * (LLaMA-style data mixes repeat high-quality sources and
    * downsample bulk ones in the SAME pass): each row emits
    * `floor(r)` guaranteed copies plus one more iff its salted hash
    * clears the fractional part, so repeat 2.5 contributes every doc
    * twice and a deterministic hash-half of docs a third time, and
    * repeat 0.5 downsamples to the hash-half — no `rand()`, the same
    * doc gets the same copies on every run and cluster layout.
    * `repeatTenths` is the per-row repeat factor in EXACT TENTHS (a
    * Column — per-source factors come from a CASE or a broadcast
    * recipe join); copies come out as `copy_idx` 0..n−1 for shuffling
    * into shards downstream ([[epochShard]]). The fractional test is
    * pure integer cross-multiplication (`bucket·10 < frac·2³²`). Pure
    * scan-side explode: output volume IS the requested mix, and
    * nothing shuffles.
    */
  def epochRepeat(df: DataFrame, idCol: Column, repeatTenths: Column,
                  salt: String = "epoch_mix"): DataFrame = {
    val frac = pmod(repeatTenths, lit(10L))
    val extra = hashBucket(idCol, salt) * lit(10L) < frac * lit(4294967296L)
    df.withColumn("__n",
        longFloorDiv(repeatTenths, lit(10L)) +
          when(extra, lit(1L)).otherwise(lit(0L)))
      .filter(col("__n") > 0L)
      .withColumn("copy_idx", explode(sequence(lit(0L), col("__n") - 1)))
      .drop("__n")
  }

  /** Train/val/test-style split assignment: `weights` are
    * (label, fraction) in declaration order, fractions summing to ~1.
    * Every id gets exactly one label; the assignment is a pure
    * function of (salt, id).
    */
  def splitAssign(id: Column, weights: Seq[(String, Double)],
                  salt: String = "split"): Column = {
    val b = hashBucket(id, salt)
    val thresholds = weights.scanLeft(0.0)(_ + _._2).tail
      .map(c => math.floor(c * 4294967296.0).toLong)
    val cases = weights.map(_._1).zip(thresholds)
    cases.init.foldRight(lit(cases.last._1): Column) { case ((label, t), rest) =>
      when(b < t, label).otherwise(rest)
    }
  }

  /** Deterministic Bernoulli keep at `rate` (a per-row Column, so
    * per-stratum rates come from a CASE or a broadcast-joined rate
    * table): keep ⇔ bucket < rate·2³². Downsampling a 100 TB corpus to
    * a weighted source mix is a scan-side filter — no shuffle at all.
    */
  def rateKeep(id: Column, rate: Column, salt: String = "mix"): Column =
    hashBucket(id, salt) < (rate * lit(4294967296.0)).cast("long")

  /** Reproducible per-epoch shuffle + shard assignment — the training
    * export shape: every row gets a shard (`pmod(hash, nShards)`) and a
    * position within its shard (rank by the epoch-salted hash, id
    * tie-break). Reading shards in position order IS the epoch's
    * "random" document order; a different `epoch` re-deals both. The
    * window partitions by shard, so the sort is per-shard — there is
    * never a global single-partition ordering, and at 100 TB each shard
    * ranks independently (shards ≈ output training files).
    */
  def epochShard(df: DataFrame, idCol: String, nShards: Int, epoch: Int): DataFrame = {
    require(nShards >= 1, "nShards must be >= 1")
    val h = hashBucket(col(idCol), s"epoch$epoch")
    val w = Window.partitionBy(col("shard")).orderBy(h.asc, col(idCol).asc)
    df.withColumn("shard", pmod(h, lit(nShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** Curriculum variant of [[epochShard]]: same deterministic shard
    * deal, but within each shard documents rank by a quality BUCKET
    * first (descending, integer-stable) and the epoch hash only breaks
    * ties — reading each shard in `pos` order feeds the highest-quality
    * bucket early in the epoch while staying shuffled inside a bucket.
    * The curriculum-learning export shape; a different `epoch` re-deals
    * the within-bucket order but not the bucket progression. Window is
    * per-shard, so there is never a global ordering bottleneck.
    */
  def curriculumShard(df: DataFrame, idCol: String, scoreBucket: Column,
                      nShards: Int, epoch: Int): DataFrame = {
    require(nShards >= 1, "nShards must be >= 1")
    val h = hashBucket(col(idCol), s"epoch$epoch")
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("q_bucket").desc, h.asc, col(idCol).asc)
    df.withColumn("q_bucket", scoreBucket)
      .withColumn("shard", pmod(h, lit(nShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** Deterministic k-per-group sample: rank group members by
    * (hash, id) and keep the first k. One shuffle on the group key;
    * hash order makes the "random" choice reproducible.
    */
  def perGroupSample(df: DataFrame, groupCols: Seq[String], idCol: String,
                     k: Int, salt: String = "pg"): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(hashBucket(col(idCol), salt), col(idCol))
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** Greedy token-budget selection: order rows by (score DESC, id) and
    * keep the prefix whose inclusive running `cost` total stays within
    * `budget` — "best documents first until the token budget is
    * spent", the standard curation step before training.
    *
    * The running total is computed WITHOUT a global-order window (a
    * naive `SUM() OVER (ORDER BY …)` collapses to ONE partition — the
    * classic 100 TB scale-killer). Instead, two-level prefix sum:
    *  1. bin rows by score granularity (`binOf`, default score·1000 —
    *     bins are score ranges, so bin order extends the global order);
    *  2. aggregate cost per bin (tiny table), broadcast the exclusive
    *     bin-prefix totals back;
    *  3. window only WITHIN each bin (partitioned ⇒ parallel);
    *     global running total = bin prefix + within-bin running total.
    *
    * Requires (score, id) unique per row for a total order (id unique
    * suffices). Returns the selected rows + `cum_cost`.
    */
  /** Weighted sampling WITHOUT replacement (Efraimidis-Spirtsos A-Res):
    * every row draws a deterministic uniform u from the md5 hash of
    * (salt, id), gets key = ln(u)/w, and the k LARGEST keys per group
    * win — inclusion probability proportional to weight, no rand(), no
    * driver state. Keys are rounded to 9 dp so the DuckDB oracle's libm
    * ln() agrees bit-for-bit after rounding; ties (astronomically rare)
    * break on id. One bounded top-k aggregation — at 100 TB only
    * k·|groups| rows reach the shuffle.
    */
  def weightedSampleWoR(df: DataFrame, groupCols: Seq[String], idCol: String,
                        weightCol: Column, k: Int,
                        salt: String = "wor"): DataFrame = {
    val u = (hashBucket(col(idCol), salt).cast("double") + lit(0.5)) / lit(4294967296.0)
    val key = round(log(u) / weightCol.cast("double"), 9)
    graft.plans.TopKAggregate.topKExploded(
        df.withColumn("__akey", key), groupCols,
        col("__akey"), col(idCol), k)
      .select(groupCols.map(col) :+ col("id").as(idCol) :+
        col("score").as("a_key") :+ col("rank"): _*)
  }

  /** Temperature-based source mixing (the multilingual-corpus rebalance
    * from the mBERT/mT5 recipes, T=2 i.e. weights ∝ √N): per-group keep
    * rates such that the kept corpus targets `targetFrac` of the total
    * with group shares ∝ √(group size) — big sources downsampled hard,
    * small sources kept nearly whole.
    *
    * Returns (group, n, rate). Determinism across engines: per-group
    * √N is rounded to 6 dp and summed as DECIMAL (order-free); the
    * rate is a fixed-order double expression rounded to 6 dp, so the
    * downstream [[rateKeep]] filter keeps the identical id set in any
    * engine. The group table is aggregate-sized — at 100 TB this whole
    * computation is one map-side-combined count plus driver-small math;
    * the corpus itself is touched only by the final scan-side filter.
    */
  def temperatureMixRates(df: DataFrame, groupCol: String,
                          targetFrac: Double): DataFrame = {
    val counts = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"))
      .withColumn("num", round(sqrt(col("n")), 6).cast("decimal(30,6)"))
    val tot = counts.agg(sum("n").as("n_tot"), sum("num").as("denom"))
    counts.crossJoin(broadcast(tot))
      .select(col(groupCol), col("n"),
        round(least(lit(1.0),
          lit(targetFrac) * col("n_tot").cast("double") *
            (col("num").cast("double") / col("denom").cast("double")) /
            col("n").cast("double")), 6).as("rate"))
  }

  /** Largest-remainder (Hamilton) apportionment of an integer budget
    * across strata, proportional to non-negative integer weights:
    * every stratum gets its floor quota, and the leftover seats go to
    * the largest remainders (stratum-key ascending tie-break). Exact
    * integer arithmetic end to end (BigInt — corpus-sized weights
    * can't overflow budget·w), allocations sum to the budget by
    * construction, and the result is deterministic for any input
    * order. Driver-side by design: the strata table is
    * aggregate-sized (#groups rows), never corpus-sized.
    */
  def hamiltonApportion(weights: Seq[(String, BigInt)],
                        budget: Long): Map[String, Long] = {
    require(weights.nonEmpty, "hamiltonApportion: need at least one stratum")
    require(weights.forall(_._2 >= 0), "hamiltonApportion: negative weight")
    // duplicate keys would award the remainder bonus to EVERY row
    // sharing the key and then collapse in the final toMap — silently
    // breaking the sums-to-budget invariant; refuse loudly instead
    require(weights.map(_._1).distinct.size == weights.size,
      "hamiltonApportion: duplicate stratum key")
    val w = weights.map(_._2).sum
    require(w > 0, "hamiltonApportion: all weights are zero")
    val quotas = weights.map { case (k, wi) =>
      (k, (BigInt(budget) * wi) / w, (BigInt(budget) * wi) % w)
    }
    val leftover = (budget - quotas.map(_._2.toLong).sum).toInt
    val bonus = quotas.sortBy { case (k, _, r) => (-r, k) }
      .take(leftover).map(_._1).toSet
    quotas.map { case (k, b, _) =>
      k -> (b.toLong + (if (bonus(k)) 1L else 0L))
    }.toMap
  }

  /** Global score-ordered budget cut. `df` MUST be deterministic (a
    * parquet scan / pure transforms): the bin totals are collected in
    * one job here and the windowed stream is consumed lazily in a
    * SECOND job by the caller — a non-deterministic input (unseeded
    * sample, unstable dedup) could disagree between the two passes and
    * silently over/under-shoot the budget. Callers with such inputs
    * must checkpoint/persist them first.
    */
  def budgetSelect(df: DataFrame, scoreCol: Column, idCol: Column,
                   costCol: Column, budget: Long,
                   binOf: Column => Column = _ * 1000): DataFrame = {
    // the explicit isNotNull mirrors the filter Catalyst infers on the
    // join side; without it the two exchange subtrees differ by that
    // one inferred filter and AQE cannot reuse the shuffle stage
    // (null-score rows could never join the bin table anyway)
    val binned = df.withColumn("__bin", floor(binOf(scoreCol)).cast("long"))
      .filter(col("__bin").isNotNull)
    // within-bin inclusive running total, partitioned by bin → parallel.
    val wInBin = Window.partitionBy(col("__bin"))
      .orderBy(scoreCol.desc, idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumd = binned.withColumn("__cum_in_bin",
      sum(costCol.cast("long")).over(wInBin))
    // Per-bin totals as a plain map-side-combined SUM over the BINNED
    // stream (sum(cost) per bin ≡ max of the inclusive running total):
    // the totals job never touches the window, so nothing needs to be
    // persisted — the window shuffle runs exactly once, lazily, when
    // the caller consumes the returned plan. The price is a second
    // column-pruned scan of the input for this #bins-row collect; at
    // 100 TB that beats caching a corpus-sized projection MEMORY_AND_
    // DISK (the pre-r11 shape, which also leaked the cache on every
    // call unless the caller honored the clearCache contract).
    // The prefix sum over the bin totals runs on the DRIVER: the table
    // is #bins rows (bounded by the score range, not the corpus), and
    // a driver scan-left + broadcast literal replaces the
    // single-partition WindowExec this used to plan — same exact
    // values, no "No Partition Defined" warning spam in every run.
    val binTotals = binned.groupBy("__bin")
      .agg(sum(costCol.cast("long")).as("__bin_cost"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(-_._1)
    val binBefore = binTotals.map(_._1)
      .zip(binTotals.scanLeft(0L)(_ + _._2).init)
    val spark = df.sparkSession
    import spark.implicits._
    val binCum = binBefore.toSeq.toDF("__bin", "__bin_before")
    cumd
      .join(broadcast(binCum), Seq("__bin"))
      .withColumn("cum_cost", col("__bin_before") + col("__cum_in_bin"))
      .filter(col("cum_cost") <= budget)
      .drop("__bin", "__bin_before", "__cum_in_bin")
  }

  /** Per-group token-budget cap — the RefinedWeb/C4-style "no more
    * than `budget` tokens per domain" curation rule: within each group,
    * documents are taken best-score-first (id tie-break) until the
    * group's budget is spent. Unlike [[budgetSelect]]'s global budget
    * (which needs the two-level bin trick to avoid a single-partition
    * window), the per-group running total is ONE window partitioned by
    * the group key: every domain ranks independently, so at 100 TB the
    * operator is a single shuffle on the group key and each partition's
    * work is bounded by its own domain's size (skewed mega-domains are
    * exactly the ones the cap truncates). Rows keep their inclusive
    * running cost as `cum_cost`.
    */
  def perGroupBudget(df: DataFrame, groupCols: Seq[String], scoreCol: Column,
                     idCol: Column, costCol: Column, budget: Long): DataFrame = {
    require(groupCols.nonEmpty, "perGroupBudget: need at least one group column")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(scoreCol.desc, idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_cost", sum(costCol.cast("long")).over(w))
      .filter(col("cum_cost") <= budget)
  }
}
