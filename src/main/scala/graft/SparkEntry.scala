package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.GraftSession
import graft.functions.{DedupFunctions => D, TextFunctions => T, VectorFunctions => V}
import graft.operators.{RangeJoin, Upsert, WindowOps}
import graft.release.Filters
import graft.rules.{Rules, RowRule}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry drives one operator from SURVEY.md §2 (the name
  * prefix is the inventory id) against the harness parquet tables; the
  * matching `oracleSql` entry is the DuckDB-equivalent SQL.
  *
  * Determinism rules used throughout (the driver hash-compares values):
  *  - fractional SUMs go through DECIMAL so partial-agg order can't
  *    change the result; final cast back to double;
  *  - per-row double arithmetic is written with the exact same operation
  *    order in both engines (IEEE-deterministic);
  *  - every LIMIT sits on a total order with a unique tie-break;
  *  - array folds (cosine) are sequential left-to-right in both engines.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    GraftSession.table(s, dir, name)

  /** events with an epoch-millis column; ts arrives as long nanos
    * (spark.sql.legacy.parquet.nanosAsLong) or as a timestamp.
    */
  private def events(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val tsMs =
      if (e.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        expr("ts div 1000000")
      else unix_millis(col("ts"))
    e.withColumn("ts_ms", tsMs)
  }

  /** sum(decimal-cast) → double: order-insensitive exact fractional sum */
  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(30, scale))).cast("double")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  // =====================================================================
  // Query implementations
  // =====================================================================

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---------------- headline TPC-H-ish analytics -------------------
    "q1_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4), 4).as("sum_disc_price"),
          count(lit(1)).as("n_rows")
        )
    }),

    "q3_top_unshipped" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy("o_orderkey")
        .agg(dsum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4), 4).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey").asc)
        .limit(10)
    }),

    "q5_nation_revenue" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(dsum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4), 4).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // ---------------- S: scans / sinks ------------------------------
    "s1_scan_pushdown" -> ((s, dir) => {
      // projection + predicate must reach the parquet scan
      t(s, dir, "lineitem")
        .filter(col("l_discount") > 0.06 && col("l_quantity") < 10)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    }),

    "s2_pair_join" -> ((s, dir) => {
      // clinical sample×patient pair analog: fact ⋈ broadcast dim
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey", "c_name", "n_name")
    }),

    "s12_upsert_diff" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val incoming = o.filter(col("o_orderkey") % 3 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 1.0).otherwise(col("o_totalprice")))
      val existing = o.filter(col("o_orderkey") % 2 =!= 0)
      // one pass: single full-outer join → conditional agg → stack
      // (was three filter+agg branches re-scanning the cached join)
      Upsert.kindCounts(incoming, existing, Seq("o_orderkey"))
    }),

    // ---------------- P: validation rule battery ---------------------
    "p_battery_orders" -> ((s, dir) => {
      val key = col("o_orderkey")
      val rules = Seq(
        RowRule("status_domain", "error",
          Rules.domain(col("o_orderstatus"), Seq("O", "F", "P")), key, ""),
        RowRule("price_positive", "error",
          col("o_totalprice").isNull || col("o_totalprice") <= 0, key, ""),
        RowRule("priority_format", "error",
          !col("o_orderpriority").rlike("^[1-5]-"), key, ""),
        RowRule("date_in_range", "warning",
          year(col("o_orderdate")) > 1998, key, "")
      )
      Rules.Battery.asDataFrame(t(s, dir, "orders"), rules)
    }),

    "p5_identifier_check" -> ((s, dir) => {
      // GENIE-ID-style prefix/length validation over document sources
      t(s, dir, "documents")
        .groupBy("source")
        .agg(
          sum(when(Rules.badIdentifier(col("source"), "src", 20), 1L).otherwise(0L)).as("n_bad"),
          count(lit(1)).as("n_rows"))
    }),

    "p12_median_check" -> ((s, dir) => {
      // AGE median heuristic analog (clinical.py:933-965)
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(round(median(col("l_quantity")), 2).as("med_qty"), count(lit(1)).as("n"))
    }),

    "p14_duplicate_keys" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
        .filter(col("n_orders") > 1)
    }),

    // ---------------- J: joins --------------------------------------
    "j5_broadcast_remap" -> ((s, dir) => {
      // code→label lookup remap (race/sex/sampletype analog): broadcast dim
      val labels = t(s, dir, "region")
        .select(col("r_regionkey").as("n_regionkey"), col("r_name").as("region_label"))
      t(s, dir, "nation")
        .join(broadcast(labels), Seq("n_regionkey"), "left")
        .select(col("n_nationkey"), col("n_name"),
          coalesce(col("region_label"), lit("UNKNOWN")).as("region_label"))
    }),

    "j3_anti_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    }),

    "j4_semi_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 100000)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_nationkey").agg(count(lit(1)).as("n_customers"))
    }),

    "j6_range_join_binned" -> ((s, dir) => {
      // genomic-interval-join analog over price bands, binned equi-join path
      val bands = t(s, dir, "part").groupBy("p_brand")
        .agg(min("p_retailprice").as("lo"), max("p_retailprice").as("hi"))
        .withColumn("g", lit(1))
      val points = t(s, dir, "lineitem")
        .withColumn("unit_price", col("l_extendedprice") / greatest(col("l_quantity"), lit(1.0)))
        .withColumn("g", lit(1))
        .select("g", "l_orderkey", "l_linenumber", "unit_price")
      RangeJoin.binnedOverlap(
        points.withColumn("p_end", col("unit_price")),
        bands, "g", "unit_price", "p_end", "lo", "hi", binSize = 200L)
        .groupBy("p_brand").agg(count(lit(1)).as("n_in_band"))
    }),

    "j8_release_diff" -> ((s, dir) => {
      // current-vs-prior release count diff (dashboard_table_updater.py:429-461)
      val o = t(s, dir, "orders")
      val prior = o.filter(year(col("o_orderdate")) <= 1996)
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n_prior"))
      val cur = o.groupBy("o_orderpriority").agg(count(lit(1)).as("n_cur"))
      cur.join(prior, Seq("o_orderpriority"), "full_outer")
        .select(col("o_orderpriority"),
          coalesce(col("n_cur"), lit(0L)).as("n_cur"),
          coalesce(col("n_prior"), lit(0L)).as("n_prior"),
          (coalesce(col("n_cur"), lit(0L)) - coalesce(col("n_prior"), lit(0L))).as("diff"))
    }),

    // ---------------- A: aggregations --------------------------------
    "a2_rollup_total" -> ((s, dir) => {
      // per-CENTER counts + Total row (dashboard_table_updater.py:127-175)
      t(s, dir, "orders")
        .rollup("o_orderstatus")
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("o_orderstatus"), lit("Total")).as("o_orderstatus"), col("n"))
    }),

    "a3_crosstab_pivot" -> ((s, dir) => {
      // ONCOTREE_CODE × CENTER crosstab analog (source × lang)
      t(s, dir, "documents")
        .groupBy("source")
        .pivot("lang", Seq("de", "en", "es", "fr", "zh"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("de", "en", "es", "fr", "zh"))
    }),

    "a4_completeness" -> ((s, dir) => {
      // per-column completeness % (dashboard_table_updater.py:16-50)
      events(s, dir).groupBy("event_type").agg(
        round(avg(when(col("value").isNotNull && col("value") > 0, 1.0).otherwise(0.0)), 6).as("value_complete"),
        round(avg(when(col("props").isNotNull && col("props") =!= "", 1.0).otherwise(0.0)), 6).as("props_complete"),
        count(lit(1)).as("n"))
    }),

    "a6_bool_aggregates" -> ((s, dir) => {
      t(s, dir, "lineitem").groupBy("l_returnflag").agg(
        bool_and(col("l_quantity") > 0).as("all_qty_pos"),
        bool_or(col("l_discount") > 0.09).as("any_deep_discount"),
        count(lit(1)).as("n"))
    }),

    "a10_value_decrease" -> ((s, dir) => {
      // release-over-release value_counts decrease check
      val e = events(s, dir)
      val old = e.filter(col("event_id") % 2 === 0).groupBy("event_type").agg(count(lit(1)).as("n_old"))
      val neu = e.groupBy("event_type").agg(count(lit(1)).as("n_new"))
      neu.join(old, Seq("event_type"), "full_outer")
        .select(col("event_type"),
          coalesce(col("n_new"), lit(0L)).as("n_new"),
          coalesce(col("n_old"), lit(0L)).as("n_old"),
          (coalesce(col("n_new"), lit(0L)) < coalesce(col("n_old"), lit(0L))).as("decreased"))
    }),

    "a1_dup_counts" -> ((s, dir) => {
      // A1: duplicate counts on a composite key
      t(s, dir, "lineitem")
        .groupBy("l_orderkey", "l_linenumber")
        .agg(count(lit(1)).as("n"))
        .filter(col("n") > 1)
        .groupBy("n").agg(count(lit(1)).as("n_keys"))
    }),

    "a9_per_sample_counts" -> ((s, dir) => {
      // A9: per-sample variant counts (mergeCheck batching input)
      events(s, dir).groupBy("user_id").agg(count(lit(1)).as("n_variants"))
    }),

    // ---------------- U3/O1/C6 ---------------------------------------
    "u3_except_missing" -> ((s, dir) => {
      // U3: ids in file but not in DB (missing-sample upload check)
      val db   = t(s, dir, "customer").filter(col("c_custkey") % 4 =!= 0).select("c_custkey")
      val file = t(s, dir, "customer").select("c_custkey")
      file.except(db).orderBy("c_custkey")
    }),

    "o1_sorted_export" -> ((s, dir) => {
      // O1: deterministic sorted export (CNA template order)
      t(s, dir, "part").groupBy("p_brand")
        .agg(count(lit(1)).as("n_parts"))
        .orderBy("p_brand")
    }),

    "c6_epoch_millis" -> ((s, dir) => {
      // C6: ISO timestamp → epoch ms (modifiedOn semantics)
      t(s, dir, "orders").select(
        col("o_orderkey"),
        (unix_timestamp(col("o_orderdate")) * 1000).as("epoch_ms"))
    }),

    // ---------------- W: windows -------------------------------------
    "w1_adjacent_deltas" -> ((s, dir) => {
      // mutation-in-cis adjacent-variant deltas (W1) over the event stream
      val e = events(s, dir).select("user_id", "event_id", "ts_ms", "value")
      WindowOps.adjacentDeltas(e, Seq("user_id"), Seq("ts_ms", "event_id"), Seq("ts_ms", "value"))
        .filter(col("ts_ms_prev").isNotNull)
        .select(col("user_id"), col("event_id"),
          col("ts_ms_delta").as("gap_ms"),
          round(col("value_delta"), 4).as("value_delta"))
    }),

    "w2_latest_per_group" -> ((s, dir) => {
      WindowOps.latestPerGroup(events(s, dir), Seq("user_id"), Seq("ts_ms", "event_id"))
        .select("user_id", "event_id", "ts_ms", "event_type")
    }),

    // ---------------- O: sort / top-k --------------------------------
    "o4_topk" -> ((s, dir) => {
      t(s, dir, "customer")
        .groupBy("c_nationkey").agg(dsum(col("c_acctbal")).as("total_bal"))
        .orderBy(col("total_bal").desc, col("c_nationkey").asc)
        .limit(15)
    }),

    // ---------------- U: set ops -------------------------------------
    "u1_union_except" -> ((s, dir) => {
      val big   = t(s, dir, "orders").filter(col("o_totalprice") > 150000).select("o_orderkey")
      val urgent = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
      val both  = big.union(urgent).distinct()
      val onlyBig = big.except(urgent)
      both.agg(count(lit(1)).as("n")).select(lit("union_distinct").as("set_op"), col("n"))
        .unionByName(onlyBig.agg(count(lit(1)).as("n")).select(lit("except").as("set_op"), col("n")))
        .unionByName(big.intersect(urgent).agg(count(lit(1)).as("n")).select(lit("intersect").as("set_op"), col("n")))
    }),

    // ---------------- F: release filters ------------------------------
    "f1_germline_greatest" -> ((s, dir) => {
      // gnomAD-max filter analog: row-wise greatest over rate columns
      val l = t(s, dir, "lineitem")
      l.filter(Filters.germlineKeep(
          Seq(col("l_discount"), col("l_tax")), 0.05, col("l_returnflag") === "A"))
        .groupBy("l_returnflag").agg(count(lit(1)).as("n_kept"))
    }),

    "f7_redaction" -> ((s, dir) => {
      // PHI-redaction when-chain + day→year conversion on synthetic ages
      t(s, dir, "customer")
        .withColumn("age_days",
          when(col("c_custkey") % 11 === 0, lit(">32485"))
            .when(col("c_custkey") % 13 === 0, lit("<6570"))
            .otherwise((col("c_custkey") % 20000 + 6600).cast("string")))
        .select(col("c_custkey"),
          Filters.daysToYears(col("age_days")).as("age_years"),
          Filters.redactAge(col("age_days")).as("age_redacted"))
    }),

    // ---------------- dedup -------------------------------------------
    "dedup_exact" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(md5(col("text"))).as("n_unique"))
    }),

    "dedup_minhash_sig" -> ((s, dir) => {
      // native one-pass Catalyst expression (graft.plans.MinHashSignature);
      // bit-identical to the composed md5 form the oracle reproduces
      val d = t(s, dir, "documents")
      d.select(col("doc_id"),
        graft.plans.MinHashSignature.signature(
          array_distinct(T.tokens(lower(col("text")))), 4).as("sig"))
        .select(col("doc_id"),
          col("sig").getItem(0).as("mh0"), col("sig").getItem(1).as("mh1"),
          col("sig").getItem(2).as("mh2"), col("sig").getItem(3).as("mh3"))
    }),

    "dedup_ngram_jaccard" -> ((s, dir) => {
      // 3-gram Jaccard for adjacent doc pairs (deterministic candidate set)
      val d  = t(s, dir, "documents")
      val sh = d.select(col("doc_id"), T.shingles(col("text"), 3).as("sh"))
      val a  = sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
      val b  = sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
      a.join(b, col("id_b") === col("id_a") + 1)
        .select(col("id_a"), col("id_b"), round(D.jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard"))
    }),

    // ---------------- text analysis ----------------------------------
    "text_stats" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"),
        T.tokenCount(col("text")).as("n_tokens"),
        T.qualityScore(col("text")).as("quality"),
        T.fingerprint(col("text")).as("fingerprint"))
    }),

    "text_langid" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), T.langId(col("text")).as("lang_pred"))
    }),

    // ---------------- similarity search ------------------------------
    "sim_pair_cosine" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val a = e.filter(col("vec_id") % 25 === 0)
        .select(col("vec_id").as("id_a"), col("embedding").as("vec_a"))
      val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vec_b"))
      b.join(broadcast(a), col("id_b") > col("id_a") && col("id_b") <= col("id_a") + 25)
        .select(col("id_a"), col("id_b"), round(V.cosine(col("vec_a"), col("vec_b")), 6).as("cos"))
    }),

    "sim_topk_bruteforce" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val c = e.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
      V.bruteForceTopK(q, c, "q_id", "c_id", "q_vec", "c_vec", 5)
        .select(col("q_id"), col("c_id"), round(col("score"), 6).as("score"), col("rank"))
    }),

    // ---------------- C: scalar function library ---------------------
    "c1_string_ops" -> ((s, dir) => {
      // upper/trim/replace/title-case cleanup battery (C1, C2)
      t(s, dir, "customer").select(
        col("c_custkey"),
        upper(col("c_mktsegment")).as("seg_upper"),
        regexp_replace(col("c_name"), "#", "-").as("name_dashed"),
        initcap(lower(col("c_mktsegment"))).as("seg_title"),
        concat_ws("-", lit("GENIE"), col("c_name")).as("genie_id"))
    }),

    "c5_date_ops" -> ((s, dir) => {
      // %b-%Y parse analog + year extraction + months_between (C5, C6, F9)
      t(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"),
        month(col("o_orderdate")).as("o_month"),
        date_format(col("o_orderdate"), "MMM-yyyy").as("seq_date"),
        round(months_between(lit("1998-06-01").cast("timestamp"), col("o_orderdate")), 2).as("months_to_cutoff"))
    }),

    "c8_imputation" -> ((s, dir) => {
      // depth = ref + alt missing-count imputation (C8, C9)
      val l = t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        when(col("l_orderkey") % 7 === 0, lit(null)).otherwise(col("l_quantity")).as("depth"),
        col("l_quantity") * 0.6 as "alt")
      l.select(
        col("l_orderkey"), col("l_linenumber"),
        coalesce(col("depth"), col("alt") / 0.6).as("depth_imputed"),
        round(when(col("depth").isNull || col("depth") === 0, 1.0)
          .otherwise(col("alt") / col("depth")), 6).as("vaf"))
    }),

    "c10_concat_key" -> ((s, dir) => {
      // 5-column " "-joined variant key (C10) + dup-count over it.
      // Group on the native tuple and concat AFTER aggregation — the
      // shuffle carries 5 typed columns, not 600k pre-built strings.
      t(s, dir, "lineitem")
        .groupBy("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_returnflag")
        .agg(count(lit(1)).as("n"))
        .filter(col("n") > 1)
        .select(concat_ws(" ",
          col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_linenumber"), col("l_returnflag")).as("variant_key"), col("n"))
    }),

    "c13_split_extract" -> ((s, dir) => {
      // split-take-part center extraction (C13, C3)
      t(s, dir, "orders").select(
        col("o_orderkey"),
        split(col("o_orderpriority"), "-").getItem(1).as("priority_word"),
        split(col("o_orderpriority"), "-").getItem(0).cast("int").as("priority_rank"))
    }),

    "c_misc_cleanup" -> ((s, dir) => {
      // C2 genie-id reformat, C4 chr-prefix strip, C12 whitespace smell
      t(s, dir, "documents").select(
        col("doc_id"),
        when(!col("source").startsWith("GENIE-"), concat(lit("GENIE-"), upper(col("source"))))
          .otherwise(col("source")).as("genie_id"),
        regexp_replace(concat(lit("chr"), (col("doc_id") % 23).cast("string")), "^chr", "").as("chrom"),
        (col("text").contains(" ")).as("has_ws"),
        size(split(col("text"), " ", -1)) - 1 as "n_spaces")
    }),

    // ---------------- A7: CNA-style value merge ----------------------
    "a7_merge_values" -> ((s, dir) => {
      // mergeCNAvalues semantics (cna.py:86-105): per key, 1 distinct
      // value → keep; 2 distinct with a 0 → the nonzero one; else null
      val e = events(s, dir)
        .withColumn("v", floor(col("value")).cast("long") % 3)
      e.groupBy("user_id", "event_type")
        .agg(countDistinct(col("v")).as("n_distinct"),
          max(col("v")).as("vmax"),
          max(when(col("v") =!= 0, col("v"))).as("vmax_nonzero"),
          bool_or(col("v") === 0).as("has_zero"))
        .select(col("user_id"), col("event_type"),
          when(col("n_distinct") === 1, col("vmax"))
            .when(col("n_distinct") === 2 && col("has_zero"), col("vmax_nonzero"))
            .otherwise(lit(null)).as("merged"))
    }),

    // ---------------- O5: sorted distinct collect --------------------
    "o5_sorted_collect" -> ((s, dir) => {
      t(s, dir, "nation")
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(array_join(array_sort(collect_set(col("n_name"))), ";").as("nations"))
    }),

    // ---------------- F2/F3: interval containment & in-panel ---------
    "f2_containment" -> ((s, dir) => {
      // whitelist containment (pyranges intersect analog): point fully
      // inside a per-priority [lo,hi] price interval, broadcast side small
      val ranges = t(s, dir, "orders").filter(col("o_orderkey") % 100 === 0)
        .groupBy(col("o_orderpriority").as("r_priority"))
        .agg(min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
      val o = t(s, dir, "orders")
      o.join(broadcast(ranges),
          col("o_orderpriority") === col("r_priority") &&
            RangeJoin.contained(col("o_totalprice"), col("o_totalprice"), col("lo"), col("hi")),
          "left_semi")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n_whitelisted"))
    }),

    "f3_inbed_filter" -> ((s, dir) => {
      // MAFinBED: variants outside their panel's padded regions removed;
      // here: lineitems whose unit price falls outside the brand band ±10
      val bands = t(s, dir, "part").groupBy("p_brand")
        .agg((min("p_retailprice") - 10.0).as("lo"), (max("p_retailprice") + 10.0).as("hi"))
        .withColumn("g", lit(1))
      val points = t(s, dir, "lineitem")
        .withColumn("unit_price", col("l_extendedprice") / greatest(col("l_quantity"), lit(1.0)))
        .withColumn("g", lit(1))
      val inBed = RangeJoin.binnedOverlap(
        points.withColumn("p_end", col("unit_price")).select("g", "l_orderkey", "l_linenumber", "unit_price", "p_end"),
        bands, "g", "unit_price", "p_end", "lo", "hi", binSize = 200L)
      // (point, brand) pairs are unique post canonical-bin dedup, so a
      // plain count replaces countDistinct (one shuffle phase less)
      inBed.groupBy("l_orderkey", "l_linenumber", "unit_price")
        .agg(count(lit(1)).as("n_panels"))
        .groupBy("n_panels").agg(count(lit(1)).as("n_variants"))
    }),

    // ---------------- W3: newest-N per group -------------------------
    "w3_newest_two" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .select(col("o_custkey"), col("o_orderkey"), col("rn"))
    }),

    // ---------------- streaming-shaped agg ---------------------------
    "stream_tumbling_counts" -> ((s, dir) => {
      // tumbling 1h window counts — same aggregation the streaming module
      // (graft.streaming) runs via readStream+watermark; batch-equivalent
      events(s, dir)
        .withColumn("win_start_ms", (col("ts_ms") - pmod(col("ts_ms"), lit(3600000L))))
        .groupBy("win_start_ms", "event_type")
        .agg(count(lit(1)).as("n_events"),
          dsum(col("value")).as("sum_value"))
    }),

    // ---------------- dedup: simhash ---------------------------------
    "dedup_simhash" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"),
        D.simhash(T.tokens(lower(col("text"))), 16).as("simhash16"))
    }),

    // ---------------- similarity: LSH bucket top-k -------------------
    "sim_lsh_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val c = e.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
      V.lshTopK(q, c, "q_id", "c_id", "q_vec", "c_vec", k = 3, bits = 8)
        .select(col("q_id"), col("c_id"), round(col("score"), 6).as("score"), col("rank"))
    }),

    // ---------------- S: reader round-trips + SQL surface ------------
    "s3_maf_na_roundtrip" -> ((s, dir) => {
      // documents → MAF-shaped TSV on disk → Maf.read → NA contract:
      // allele literals survive, other columns' "NA" becomes null
      val alleles = array(lit("NA"), lit("nan"), lit("ATCG"), lit("-"), lit("TT"))
      val mafLike = t(s, dir, "documents").select(
        col("doc_id").as("DOC_ID"),
        (col("doc_id") % 22 + 1).cast("string").as("CHROMOSOME"),
        element_at(alleles, (col("doc_id") % 5 + 1).cast("int")).as("REF"),
        when(col("doc_id") % 3 === 0, lit("NA")).otherwise(lit("p.X1Y")).as("HGVSP"))
      val tmp = s"${sys.props("java.io.tmpdir")}/graft_s3_${dir.replaceAll("[^a-z0-9.]", "_")}"
      graft.sources.Tsv.write(mafLike, tmp)
      graft.sources.Maf.read(s, tmp)
        .groupBy(col("REFERENCE_ALLELE").as("reference_allele"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("HGVSP").isNull, 1L).otherwise(0L)).as("n_hgvsp_null"))
    }),

    "s9_sql_pushdown" -> ((s, dir) => {
      // Synapse-tableQuery analog: the engine's SQL surface over views
      t(s, dir, "orders").createOrReplaceTempView("orders_v")
      t(s, dir, "customer").createOrReplaceTempView("customer_v")
      s.sql(
        """SELECT c_mktsegment,
                  COUNT(DISTINCT c_custkey) AS n_cust,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS total
           FROM orders_v JOIN customer_v ON o_custkey = c_custkey
           WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           GROUP BY c_mktsegment""")
    }),

    "s11_tsv_roundtrip" -> ((s, dir) => {
      // .0-free TSV writer: integral doubles come back dot-free
      val sample = t(s, dir, "lineitem").filter(col("l_orderkey") % 100 === 0)
        .select(col("l_orderkey").as("ID"), col("l_quantity").as("VAL"))
      val tmp = s"${sys.props("java.io.tmpdir")}/graft_s11_${dir.replaceAll("[^a-z0-9.]", "_")}"
      graft.sources.Tsv.write(sample, tmp)
      graft.sources.Tsv.readAllString(s, tmp)
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("VAL").contains("."), 1L).otherwise(0L)).as("n_with_dot"))
    }),

    // ---------------- P: extended rule battery ------------------------
    "p_battery_synthetic" -> ((s, dir) => {
      val langs   = Seq("de", "en", "es", "fr", "zh")
      val alleles = array(lit("ATCG"), lit("N"), lit("-"), lit("xx"), lit("NA"), lit("GG"))
      val d = t(s, dir, "documents").select(
        col("doc_id"),
        when(col("doc_id") % 11 === 0, concat(col("lang"), lit(";INVALID")))
          .otherwise(col("lang")).as("multi_val"),
        when(col("doc_id") % 13 === 0, lit("2199"))
          .when(col("doc_id") % 17 === 0, lit("Unknown"))
          .otherwise(concat(lit("19"), lpad((col("doc_id") % 100).cast("string"), 2, "0"))).as("year_col"),
        element_at(alleles, (col("doc_id") % 6 + 1).cast("int")).as("allele"),
        (col("doc_id") % 25).cast("string").as("chrom"),
        col("n_chars").as("start_pos"),
        when(col("doc_id") % 19 === 0, col("n_chars") - 5)
          .otherwise(col("n_chars") + 10).as("end_pos"),
        when(col("doc_id") % 23 === 0, concat(lit("x"), col("doc_id").cast("string")))
          .otherwise(col("doc_id").cast("string")).as("int_col"))
      val key = col("doc_id")
      Rules.Battery.asDataFrame(d, Seq(
        RowRule("p2_multi_domain", "error",
          Rules.domain(col("multi_val"), langs, sep = Some(";")), key, ""),
        RowRule("p4_integer", "error", Rules.notInteger(col("int_col")), key, ""),
        RowRule("p6_year", "error",
          Rules.badYear(col("year_col"), 2026, Seq("Unknown")), key, ""),
        RowRule("p16_allele", "error", Rules.badAllele(col("allele")), key, ""),
        RowRule("p18_chromosome", "error", Rules.badChromosome(col("chrom")), key, ""),
        RowRule("p19_start_end", "warning",
          Rules.startAfterEnd(col("start_pos"), col("end_pos")), key, "")))
    }),

    // ---------------- F4: mutation-in-cis flags -----------------------
    "f4_cis_flags" -> ((s, dir) => {
      // adjacent events <6s apart with small value delta = "in cis"
      val e = events(s, dir).select("user_id", "event_id", "ts_ms", "value")
      val d = WindowOps.adjacentDeltas(e, Seq("user_id"), Seq("ts_ms", "event_id"), Seq("ts_ms", "value"))
      d.withColumn("flagged",
          WindowOps.cisFlag(col("ts_ms_delta"), col("value_delta") / 100.0, lit(null),
            maxBp = 6000, maxVafDelta = 0.05))
        .groupBy("user_id")
        .agg(sum(when(col("flagged"), 1L).otherwise(0L)).as("n_flagged"),
          count(lit(1)).as("n_events"))
    }),

    // ---------------- F10/A8: keep-list propagation -------------------
    "f10_sample_subset" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val keep = docs.filter(col("lang").isin("en", "fr") && col("doc_id") % 3 === 0)
        .select("doc_id")
      Filters.keepSamples(docs, keep, "doc_id")
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"),
          countDistinct(col("lang")).as("n_langs"))
    }),

    // ---------------- J2: cross-center outer merge --------------------
    "j2_outer_merge" -> ((s, dir) => {
      // CNA merge-across-centers analog: per-gene values from two
      // centers full-outer joined on the gene key
      val l = t(s, dir, "lineitem").withColumn("gene", col("l_partkey") % 40)
      val a = l.filter(col("l_orderkey") % 2 === 0).groupBy("gene")
        .agg(dsum(col("l_quantity")).as("qty_a"))
      val b = l.filter(col("l_orderkey") % 2 === 1).groupBy("gene")
        .agg(dsum(col("l_quantity")).as("qty_b"))
      a.join(b, Seq("gene"), "full_outer")
        .select(col("gene"),
          coalesce(col("qty_a"), lit(0.0)).as("qty_a"),
          coalesce(col("qty_b"), lit(0.0)).as("qty_b"))
    }),

    // ---------------- text: BPE-ish token budget ----------------------
    "text_bpe_tokens" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          T.tokenCount(col("text")).as("n_ws_tokens"),
          T.bpeishTokenCount(col("text")).as("n_bpe_tokens"))
    }),

    // ---------------- dedup: embedding near-dup via LSH buckets -------
    "dedup_embedding_neardup" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val b = e.select(col("vec_id"), col("embedding"),
        V.signBucket(col("embedding"), 12).as("bucket"))
      val a2 = b.select(col("vec_id").as("id_a"), col("embedding").as("vec_a"), col("bucket"))
      val b2 = b.select(col("vec_id").as("id_b"), col("embedding").as("vec_b"), col("bucket"))
      a2.join(b2, Seq("bucket"))
        .filter(col("id_a") < col("id_b"))
        .withColumn("cos", round(V.cosine(col("vec_a"), col("vec_b")), 6))
        .filter(col("cos") >= 0.35)
        .select("id_a", "id_b", "cos")
    }),

    // ---------------- similarity: IVF-style coarse partition ----------
    "sim_ivf_label" -> ((s, dir) => {
      // label column = coarse quantizer cell: search only the query's cell
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"), col("label"))
      val c = e.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"), col("label"))
      val joined = c.join(broadcast(q), Seq("label"))
        .filter(col("q_id") =!= col("c_id"))
        .withColumn("score", V.cosine(col("q_vec"), col("c_vec")))
      val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("c_id").asc)
      joined.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("q_id"), col("c_id"), round(col("score"), 6).as("score"), col("rank"))
    }),

    // ---------------- CNA matrix lifecycle ---------------------------
    "cna_melt_merge" -> ((s, dir) => {
      // wide matrix → melt → A7 merge → long form (graft.formats.CnaFormat)
      val wide = t(s, dir, "documents")
        .groupBy(col("lang").as("Hugo_Symbol"))
        .pivot("source", (0 until 20).map(i => s"src$i"))
        .count()
      val merged = graft.formats.CnaFormat.mergeDuplicateGenes(
        graft.formats.CnaFormat.melt(wide))
      merged.select(col("HUGO_SYMBOL").as("hugo_symbol"),
        col("SAMPLE_ID").as("sample_id"), col("VALUE").cast("long").as("value"))
    }),

    // ---------------- BED gene remap (90% rule) ----------------------
    "bed_remap_90pct" -> ((s, dir) => {
      val genes = t(s, dir, "part").groupBy("p_brand")
        .agg(min("p_retailprice").cast("long").as("START_POSITION"),
          max("p_retailprice").cast("long").as("END_POSITION"))
        .select(lit("1").as("CHROMOSOME"), col("START_POSITION"), col("END_POSITION"),
          col("p_brand").as("HUGO_SYMBOL"))
      val regions = t(s, dir, "lineitem").filter(col("l_orderkey") % 50 === 0)
        .select(lit("1").as("CHROMOSOME"),
          (col("l_extendedprice") / greatest(col("l_quantity"), lit(1.0))).cast("long").as("START_POSITION"))
        .withColumn("END_POSITION", col("START_POSITION") + 50)
        .withColumn("HUGO_SYMBOL", lit("submitted"))
        .distinct()
      graft.operators.BedRemap.remap(regions, genes)
        .groupBy(col("IN_GENE"), col("HUGO_SYMBOL").as("hugo_symbol"))
        .agg(count(lit(1)).as("n_regions"))
    }),

    // ---------------- multimodal plumbing ----------------------------
    "mm_binary_meta" -> ((s, dir) => {
      // opaque binary column + deterministic fake decode (see
      // graft.multimodal — the real decode is stubbed, the plumbing real)
      t(s, dir, "documents")
        .withColumn("payload", col("text").cast("binary"))
        .select(col("doc_id"),
          octet_length(col("payload")).as("n_bytes"),
          (octet_length(col("payload")) % 64 + 1).as("fake_width"),
          (octet_length(col("payload")) % 7 + 1).as("fake_frames"))
    })
  )

  // =====================================================================
  // DuckDB oracles (same column names, same determinism discipline)
  // =====================================================================

  def oracleSql: Map[String, String] = {
    val revExpr = "CAST(SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount), 4) AS DECIMAL(30,4))) AS DOUBLE)"
    Map(
      "q1_pricing_summary" ->
        s"""SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_base_price,
           $revExpr AS sum_disc_price,
           COUNT(*) AS n_rows
           FROM lineitem GROUP BY l_returnflag, l_linestatus""",

      "q3_top_unshipped" ->
        s"""SELECT o_orderkey, $revExpr AS revenue
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           WHERE c_mktsegment = 'BUILDING'
           GROUP BY o_orderkey
           ORDER BY revenue DESC, o_orderkey ASC LIMIT 10""",

      "q5_nation_revenue" ->
        s"""SELECT r_name, n_name, $revExpr AS revenue, COUNT(*) AS n_items
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           GROUP BY r_name, n_name""",

      "s1_scan_pushdown" ->
        """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
           FROM lineitem WHERE l_discount > 0.06 AND l_quantity < 10""",

      "s2_pair_join" ->
        """SELECT c_custkey, c_name, n_name
           FROM customer JOIN nation ON c_nationkey = n_nationkey""",

      "s12_upsert_diff" ->
        """WITH inc AS (
             SELECT o_orderkey,
                    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS v
             FROM orders WHERE o_orderkey % 3 <> 0),
           ex AS (SELECT o_orderkey, o_totalprice AS v FROM orders WHERE o_orderkey % 2 <> 0)
           SELECT 'append' AS kind, COUNT(*) AS n FROM inc
             WHERE o_orderkey NOT IN (SELECT o_orderkey FROM ex)
           UNION ALL
           SELECT 'update' AS kind, COUNT(*) AS n FROM inc JOIN ex USING (o_orderkey)
             WHERE inc.v IS DISTINCT FROM ex.v
           UNION ALL
           SELECT 'delete' AS kind, COUNT(*) AS n FROM ex
             WHERE o_orderkey NOT IN (SELECT o_orderkey FROM inc)""",

      "p_battery_orders" ->
        """SELECT 'status_domain' AS rule, 'error' AS severity,
                  COUNT(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 END) AS n_violations,
                  MIN(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN CAST(o_orderkey AS VARCHAR) END) AS example
           FROM orders
           UNION ALL
           SELECT 'price_positive', 'error',
                  COUNT(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0 THEN 1 END),
                  MIN(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0 THEN CAST(o_orderkey AS VARCHAR) END)
           FROM orders
           UNION ALL
           SELECT 'priority_format', 'error',
                  COUNT(CASE WHEN NOT regexp_matches(o_orderpriority, '^[1-5]-') THEN 1 END),
                  MIN(CASE WHEN NOT regexp_matches(o_orderpriority, '^[1-5]-') THEN CAST(o_orderkey AS VARCHAR) END)
           FROM orders
           UNION ALL
           SELECT 'date_in_range', 'warning',
                  COUNT(CASE WHEN year(o_orderdate) > 1998 THEN 1 END),
                  MIN(CASE WHEN year(o_orderdate) > 1998 THEN CAST(o_orderkey AS VARCHAR) END)
           FROM orders""",

      "p5_identifier_check" ->
        """SELECT source,
                  COUNT(CASE WHEN source IS NULL OR NOT starts_with(source, 'src')
                             OR length(source) >= 20 THEN 1 END) AS n_bad,
                  COUNT(*) AS n_rows
           FROM documents GROUP BY source""",

      "p12_median_check" ->
        """SELECT l_returnflag, ROUND(MEDIAN(l_quantity), 2) AS med_qty, COUNT(*) AS n
           FROM lineitem GROUP BY l_returnflag""",

      "p14_duplicate_keys" ->
        """SELECT o_custkey, COUNT(*) AS n_orders FROM orders
           GROUP BY o_custkey HAVING COUNT(*) > 1""",

      "j3_anti_join" ->
        """SELECT c_custkey, c_name FROM customer
           WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""",

      "j4_semi_join" ->
        """SELECT c_nationkey, COUNT(*) AS n_customers FROM customer
           WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
           GROUP BY c_nationkey""",

      "j5_broadcast_remap" ->
        """SELECT n_nationkey, n_name, COALESCE(r_name, 'UNKNOWN') AS region_label
           FROM nation LEFT JOIN region ON n_regionkey = r_regionkey""",

      "a1_dup_counts" ->
        """SELECT n, COUNT(*) AS n_keys FROM (
             SELECT l_orderkey, l_linenumber, COUNT(*) AS n FROM lineitem
             GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1)
           GROUP BY n""",

      "a9_per_sample_counts" ->
        """SELECT user_id, COUNT(*) AS n_variants FROM events GROUP BY user_id""",

      "u3_except_missing" ->
        """SELECT c_custkey FROM customer
           EXCEPT SELECT c_custkey FROM customer WHERE c_custkey % 4 <> 0
           ORDER BY c_custkey""",

      "o1_sorted_export" ->
        """SELECT p_brand, COUNT(*) AS n_parts FROM part GROUP BY p_brand ORDER BY p_brand""",

      "c6_epoch_millis" ->
        """SELECT o_orderkey, epoch_ms(o_orderdate) AS epoch_ms FROM orders""",

      "j6_range_join_binned" ->
        """WITH bands AS (
             SELECT p_brand, MIN(p_retailprice) AS lo, MAX(p_retailprice) AS hi
             FROM part GROUP BY p_brand),
           points AS (
             SELECT l_orderkey, l_linenumber,
                    l_extendedprice / greatest(l_quantity, 1.0) AS unit_price
             FROM lineitem)
           SELECT p_brand, COUNT(*) AS n_in_band
           FROM points JOIN bands ON unit_price >= lo AND unit_price <= hi
           GROUP BY p_brand""",

      "j8_release_diff" ->
        """WITH prior AS (
             SELECT o_orderpriority, COUNT(*) AS n_prior FROM orders
             WHERE year(o_orderdate) <= 1996 GROUP BY o_orderpriority),
           cur AS (SELECT o_orderpriority, COUNT(*) AS n_cur FROM orders GROUP BY o_orderpriority)
           SELECT COALESCE(cur.o_orderpriority, prior.o_orderpriority) AS o_orderpriority,
                  COALESCE(n_cur, 0) AS n_cur, COALESCE(n_prior, 0) AS n_prior,
                  COALESCE(n_cur, 0) - COALESCE(n_prior, 0) AS diff
           FROM cur FULL OUTER JOIN prior USING (o_orderpriority)""",

      "a2_rollup_total" ->
        """SELECT COALESCE(o_orderstatus, 'Total') AS o_orderstatus, COUNT(*) AS n
           FROM orders GROUP BY ROLLUP(o_orderstatus)""",

      "a3_crosstab_pivot" ->
        """SELECT source,
                  COUNT(CASE WHEN lang = 'de' THEN 1 END) AS de,
                  COUNT(CASE WHEN lang = 'en' THEN 1 END) AS en,
                  COUNT(CASE WHEN lang = 'es' THEN 1 END) AS es,
                  COUNT(CASE WHEN lang = 'fr' THEN 1 END) AS fr,
                  COUNT(CASE WHEN lang = 'zh' THEN 1 END) AS zh
           FROM documents GROUP BY source""",

      "a4_completeness" ->
        """SELECT event_type,
                  ROUND(AVG(CASE WHEN value IS NOT NULL AND value > 0 THEN 1.0 ELSE 0.0 END), 6) AS value_complete,
                  ROUND(AVG(CASE WHEN props IS NOT NULL AND props <> '' THEN 1.0 ELSE 0.0 END), 6) AS props_complete,
                  COUNT(*) AS n
           FROM events GROUP BY event_type""",

      "a6_bool_aggregates" ->
        """SELECT l_returnflag, BOOL_AND(l_quantity > 0) AS all_qty_pos,
                  BOOL_OR(l_discount > 0.09) AS any_deep_discount, COUNT(*) AS n
           FROM lineitem GROUP BY l_returnflag""",

      "a10_value_decrease" ->
        """WITH old AS (
             SELECT event_type, COUNT(*) AS n_old FROM events
             WHERE event_id % 2 = 0 GROUP BY event_type),
           neu AS (SELECT event_type, COUNT(*) AS n_new FROM events GROUP BY event_type)
           SELECT COALESCE(neu.event_type, old.event_type) AS event_type,
                  COALESCE(n_new, 0) AS n_new, COALESCE(n_old, 0) AS n_old,
                  COALESCE(n_new, 0) < COALESCE(n_old, 0) AS decreased
           FROM neu FULL OUTER JOIN old USING (event_type)""",

      "w1_adjacent_deltas" ->
        """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, value FROM events)
           SELECT user_id, event_id,
                  ts_ms - LAG(ts_ms) OVER w AS gap_ms,
                  ROUND(value - LAG(value) OVER w, 4) AS value_delta
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
           QUALIFY LAG(ts_ms) OVER w IS NOT NULL""",

      "w2_latest_per_group" ->
        """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, event_type FROM events)
           SELECT user_id, event_id, ts_ms, event_type FROM e
           QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts_ms DESC, event_id DESC) = 1""",

      "o4_topk" ->
        """SELECT c_nationkey, CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) AS total_bal
           FROM customer GROUP BY c_nationkey
           ORDER BY total_bal DESC, c_nationkey ASC LIMIT 15""",

      "u1_union_except" ->
        """WITH big AS (SELECT o_orderkey FROM orders WHERE o_totalprice > 150000),
                urgent AS (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
           SELECT 'union_distinct' AS set_op, COUNT(*) AS n
             FROM (SELECT DISTINCT o_orderkey FROM (SELECT * FROM big UNION ALL SELECT * FROM urgent))
           UNION ALL
           SELECT 'except' AS set_op, COUNT(*) AS n
             FROM (SELECT o_orderkey FROM big EXCEPT SELECT o_orderkey FROM urgent)
           UNION ALL
           SELECT 'intersect' AS set_op, COUNT(*) AS n
             FROM (SELECT o_orderkey FROM big INTERSECT SELECT o_orderkey FROM urgent)""",

      "f1_germline_greatest" ->
        """SELECT l_returnflag, COUNT(*) AS n_kept FROM lineitem
           WHERE l_returnflag = 'A'
              OR COALESCE(GREATEST(l_discount, l_tax), 0.0) <= 0.05
           GROUP BY l_returnflag""",

      "f7_redaction" ->
        """WITH aged AS (
             SELECT c_custkey,
                    CASE WHEN c_custkey % 11 = 0 THEN '>32485'
                         WHEN c_custkey % 13 = 0 THEN '<6570'
                         ELSE CAST(c_custkey % 20000 + 6600 AS VARCHAR) END AS age_days
             FROM customer)
           SELECT c_custkey,
                  CASE WHEN age_days = '>32485' THEN '>89'
                       WHEN age_days = '<6570' THEN '<18'
                       WHEN regexp_matches(age_days, '^-?\d+$')
                         THEN CAST(CAST(FLOOR(CAST(age_days AS DOUBLE) / 365.25) AS BIGINT) AS VARCHAR)
                       ELSE age_days END AS age_years,
                  CASE WHEN age_days IS NULL THEN NULL
                       WHEN starts_with(age_days, '>') THEN 'cannotReleaseHIPAA'
                       WHEN starts_with(age_days, '<') THEN 'withheld'
                       ELSE age_days END AS age_redacted
           FROM aged""",

      "dedup_exact" ->
        """SELECT lang, COUNT(*) AS n_docs, COUNT(DISTINCT md5(text)) AS n_unique
           FROM documents GROUP BY lang""",

      "dedup_minhash_sig" -> {
        def mh(i: Int) =
          s"list_aggregate(list_transform(toks, t -> md5('$i:' || t)), 'min') AS mh$i"
        s"""WITH tok AS (
             SELECT doc_id,
                    list_distinct(regexp_split_to_array(trim(lower(text)), '\\s+')) AS toks
             FROM documents)
           SELECT doc_id, ${mh(0)}, ${mh(1)}, ${mh(2)}, ${mh(3)} FROM tok"""
      },

      "dedup_ngram_jaccard" ->
        """WITH sh AS (
             SELECT doc_id,
                    CASE WHEN len(toks) >= 3 THEN
                      list_distinct(list_transform(range(0, len(toks) - 2),
                        i -> array_to_string(toks[i+1:i+3], ' ')))
                    ELSE [array_to_string(toks, ' ')] END AS shingles
             FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
                   FROM documents))
           SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                  ROUND(CASE WHEN len(list_distinct(a.shingles || b.shingles)) = 0 THEN 1.0
                        ELSE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                             / CAST(len(list_distinct(a.shingles || b.shingles)) AS DOUBLE) END, 6) AS jaccard
           FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1""",

      "text_stats" ->
        """SELECT doc_id,
                  len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
                  ROUND(
                    LEAST(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.4
                    + CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
                      / GREATEST(CAST(length(text) AS DOUBLE), 1.0) * 0.4
                    + CASE WHEN CAST(length(text) AS DOUBLE)
                                / GREATEST(CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE), 1.0)
                                BETWEEN 3.0 AND 12.0 THEN 1.0 ELSE 0.5 END * 0.2, 6) AS quality,
                  md5(array_to_string(list_sort(list_distinct(
                    regexp_split_to_array(trim(lower(text)), '\s+'))), ' ')) AS fingerprint
           FROM documents""",

      "text_langid" ->
        """WITH sc AS (
             SELECT doc_id, lang,
                    regexp_split_to_array(trim(lower(text)), '\s+') AS toks
             FROM documents),
           hits AS (
             SELECT doc_id, lang,
               len(list_filter(toks, t -> t IN ('the','and','of','to','in','is','a','that'))) AS h_en,
               len(list_filter(toks, t -> t IN ('el','la','de','que','y','en','los','una'))) AS h_es,
               len(list_filter(toks, t -> t IN ('le','la','de','et','les','des','un','une'))) AS h_fr,
               len(list_filter(toks, t -> t IN ('der','die','und','das','von','zu','mit','ein'))) AS h_de
             FROM sc)
           SELECT doc_id, lang,
                  CASE WHEN GREATEST(h_en, h_es, h_fr, h_de) = 0 THEN 'und'
                       WHEN h_fr = GREATEST(h_en, h_es, h_fr, h_de) THEN 'fr'
                       WHEN h_es = GREATEST(h_en, h_es, h_fr, h_de) THEN 'es'
                       WHEN h_en = GREATEST(h_en, h_es, h_fr, h_de) THEN 'en'
                       ELSE 'de' END AS lang_pred
           FROM hits""",

      "sim_pair_cosine" ->
        """WITH a AS (SELECT vec_id AS id_a, embedding AS vec_a FROM embeddings WHERE vec_id % 25 = 0),
                b AS (SELECT vec_id AS id_b, embedding AS vec_b FROM embeddings)
           SELECT id_a, id_b,
                  ROUND(
                    list_sum(list_transform(range(1, 65), i -> CAST(vec_a[i] AS DOUBLE) * CAST(vec_b[i] AS DOUBLE)))
                    / (SQRT(list_sum(list_transform(range(1, 65), i -> CAST(vec_a[i] AS DOUBLE) * CAST(vec_a[i] AS DOUBLE))))
                       * SQRT(list_sum(list_transform(range(1, 65), i -> CAST(vec_b[i] AS DOUBLE) * CAST(vec_b[i] AS DOUBLE))))), 6) AS cos
           FROM b JOIN a ON id_b > id_a AND id_b <= id_a + 25""",

      "sim_topk_bruteforce" ->
        """WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 10),
                c AS (SELECT vec_id AS c_id, embedding AS c_vec FROM embeddings),
           scored AS (
             SELECT q_id, c_id,
                    list_sum(list_transform(range(1, 65), i -> CAST(q_vec[i] AS DOUBLE) * CAST(c_vec[i] AS DOUBLE)))
                    / (SQRT(list_sum(list_transform(range(1, 65), i -> CAST(q_vec[i] AS DOUBLE) * CAST(q_vec[i] AS DOUBLE))))
                       * SQRT(list_sum(list_transform(range(1, 65), i -> CAST(c_vec[i] AS DOUBLE) * CAST(c_vec[i] AS DOUBLE))))) AS score
             FROM q JOIN c ON q_id <> c_id)
           SELECT q_id, c_id, ROUND(score, 6) AS score,
                  CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, c_id ASC) AS INT) AS rank
           FROM scored
           QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, c_id ASC) <= 5""",

      "c1_string_ops" ->
        """SELECT c_custkey,
                  UPPER(c_mktsegment) AS seg_upper,
                  regexp_replace(c_name, '#', '-', 'g') AS name_dashed,
                  UPPER(substring(LOWER(c_mktsegment), 1, 1)) || substring(LOWER(c_mktsegment), 2) AS seg_title,
                  'GENIE-' || c_name AS genie_id
           FROM customer""",

      "c5_date_ops" ->
        """SELECT o_orderkey,
                  year(o_orderdate) AS o_year,
                  month(o_orderdate) AS o_month,
                  strftime(o_orderdate, '%b-%Y') AS seq_date,
                  ROUND((1998 - year(o_orderdate)) * 12 + (6 - month(o_orderdate))
                        + (1 - day(o_orderdate)) / 31.0, 2) AS months_to_cutoff
           FROM orders""",

      "c8_imputation" ->
        """WITH l AS (
             SELECT l_orderkey, l_linenumber,
                    CASE WHEN l_orderkey % 7 = 0 THEN NULL ELSE l_quantity END AS depth,
                    l_quantity * 0.6 AS alt
             FROM lineitem)
           SELECT l_orderkey, l_linenumber,
                  COALESCE(depth, alt / 0.6) AS depth_imputed,
                  ROUND(CASE WHEN depth IS NULL OR depth = 0 THEN 1.0 ELSE alt / depth END, 6) AS vaf
           FROM l""",

      "c10_concat_key" ->
        """SELECT CAST(l_orderkey AS VARCHAR) || ' ' || CAST(l_partkey AS VARCHAR) || ' '
                  || CAST(l_suppkey AS VARCHAR) || ' ' || CAST(l_linenumber AS VARCHAR) || ' '
                  || l_returnflag AS variant_key,
                  COUNT(*) AS n
           FROM lineitem GROUP BY 1 HAVING COUNT(*) > 1""",

      "c13_split_extract" ->
        """SELECT o_orderkey,
                  string_split(o_orderpriority, '-')[2] AS priority_word,
                  CAST(string_split(o_orderpriority, '-')[1] AS INT) AS priority_rank
           FROM orders""",

      "c_misc_cleanup" ->
        """SELECT doc_id,
                  CASE WHEN NOT starts_with(source, 'GENIE-')
                       THEN 'GENIE-' || UPPER(source) ELSE source END AS genie_id,
                  regexp_replace('chr' || CAST(doc_id % 23 AS VARCHAR), '^chr', '') AS chrom,
                  contains(text, ' ') AS has_ws,
                  len(string_split(text, ' ')) - 1 AS n_spaces
           FROM documents""",

      "a7_merge_values" ->
        """WITH e AS (
             SELECT user_id, event_type, CAST(FLOOR(value) AS BIGINT) % 3 AS v FROM events),
           g AS (
             SELECT user_id, event_type,
                    COUNT(DISTINCT v) AS n_distinct, MAX(v) AS vmax,
                    MAX(CASE WHEN v <> 0 THEN v END) AS vmax_nonzero,
                    BOOL_OR(v = 0) AS has_zero
             FROM e GROUP BY user_id, event_type)
           SELECT user_id, event_type,
                  CASE WHEN n_distinct = 1 THEN vmax
                       WHEN n_distinct = 2 AND has_zero THEN vmax_nonzero
                       ELSE NULL END AS merged
           FROM g""",

      "o5_sorted_collect" ->
        """SELECT r_name, string_agg(n_name, ';' ORDER BY n_name) AS nations
           FROM nation JOIN region ON n_regionkey = r_regionkey
           GROUP BY r_name""",

      "f2_containment" ->
        """WITH ranges AS (
             SELECT o_orderpriority AS r_priority,
                    MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
             FROM orders WHERE o_orderkey % 100 = 0 GROUP BY o_orderpriority)
           SELECT o_orderpriority, COUNT(*) AS n_whitelisted
           FROM orders o
           WHERE EXISTS (SELECT 1 FROM ranges r
                         WHERE o.o_orderpriority = r.r_priority
                           AND o.o_totalprice >= r.lo AND o.o_totalprice <= r.hi)
           GROUP BY o_orderpriority""",

      "f3_inbed_filter" ->
        """WITH bands AS (
             SELECT p_brand, MIN(p_retailprice) - 10.0 AS lo, MAX(p_retailprice) + 10.0 AS hi
             FROM part GROUP BY p_brand),
           points AS (
             SELECT l_orderkey, l_linenumber,
                    l_extendedprice / greatest(l_quantity, 1.0) AS unit_price
             FROM lineitem),
           matched AS (
             SELECT l_orderkey, l_linenumber, unit_price,
                    COUNT(DISTINCT p_brand) AS n_panels
             FROM points JOIN bands ON unit_price >= lo AND unit_price <= hi
             GROUP BY l_orderkey, l_linenumber, unit_price)
           SELECT n_panels, COUNT(*) AS n_variants FROM matched GROUP BY n_panels""",

      "w3_newest_two" ->
        """SELECT o_custkey, o_orderkey, rn FROM (
             SELECT o_custkey, o_orderkey,
                    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate DESC, o_orderkey DESC) AS INT) AS rn
             FROM orders)
           WHERE rn <= 2""",

      "stream_tumbling_counts" ->
        """WITH e AS (SELECT epoch_ms(ts) AS ts_ms, event_type, value FROM events)
           SELECT ts_ms - (ts_ms % 3600000) AS win_start_ms, event_type,
                  COUNT(*) AS n_events,
                  CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value
           FROM e GROUP BY 1, 2""",

      "dedup_simhash" -> {
        val bitExprs = (0 until 16).map { i =>
          s"""CAST(CASE WHEN list_sum(list_transform(hs,
              h -> CASE WHEN substring(h, ${i + 1}, 1) IN ('8','9','a','b','c','d','e','f')
                   THEN 1 ELSE -1 END)) > 0 THEN ${1L << i} ELSE 0 END AS BIGINT)"""
        }.mkString(" + ")
        s"""WITH tok AS (
             SELECT doc_id,
                    list_transform(list_distinct(regexp_split_to_array(trim(lower(text)), '\\s+')),
                                   t -> md5(t)) AS hs
             FROM documents)
           SELECT doc_id, $bitExprs AS simhash16 FROM tok"""
      },

      "sim_lsh_topk" -> {
        val bucket = (0 until 8).map(i => s"CASE WHEN embedding[${i + 1}] >= 0 THEN ${1L << i} ELSE 0 END")
          .mkString(" + ")
        s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec, $bucket AS bucket
                      FROM embeddings WHERE vec_id < 10),
                c AS (SELECT vec_id AS c_id, embedding AS c_vec, $bucket AS bucket FROM embeddings),
           scored AS (
             SELECT q_id, c_id,
                    list_sum(list_transform(range(1, 65), i -> CAST(q_vec[i] AS DOUBLE) * CAST(c_vec[i] AS DOUBLE)))
                    / (SQRT(list_sum(list_transform(range(1, 65), i -> CAST(q_vec[i] AS DOUBLE) * CAST(q_vec[i] AS DOUBLE))))
                       * SQRT(list_sum(list_transform(range(1, 65), i -> CAST(c_vec[i] AS DOUBLE) * CAST(c_vec[i] AS DOUBLE))))) AS score
             FROM q JOIN c USING (bucket) WHERE q_id <> c_id)
           SELECT q_id, c_id, ROUND(score, 6) AS score,
                  CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, c_id ASC) AS INT) AS rank
           FROM scored
           QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, c_id ASC) <= 3"""
      },

      "s3_maf_na_roundtrip" ->
        """SELECT CASE CAST(doc_id % 5 AS INT) WHEN 0 THEN 'NA' WHEN 1 THEN 'nan'
                       WHEN 2 THEN 'ATCG' WHEN 3 THEN '-' ELSE 'TT' END AS reference_allele,
                  COUNT(*) AS n,
                  COUNT(CASE WHEN doc_id % 3 = 0 THEN 1 END) AS n_hgvsp_null
           FROM documents GROUP BY 1""",

      "s9_sql_pushdown" ->
        """SELECT c_mktsegment, COUNT(DISTINCT c_custkey) AS n_cust,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS total
           FROM orders JOIN customer ON o_custkey = c_custkey
           WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           GROUP BY c_mktsegment""",

      "s11_tsv_roundtrip" ->
        """SELECT COUNT(*) AS n_rows,
                  COUNT(CASE WHEN l_quantity <> FLOOR(l_quantity) THEN 1 END) AS n_with_dot
           FROM lineitem WHERE l_orderkey % 100 = 0""",

      "p_battery_synthetic" -> {
        val ruleRows = Seq(
          ("p2_multi_domain", "error",
            """multi_val IS NOT NULL AND len(list_filter(string_split(multi_val, ';'),
               x -> trim(x) NOT IN ('de','en','es','fr','zh'))) > 0"""),
          ("p4_integer", "error",
            """int_col IS NOT NULL AND NOT regexp_matches(int_col, '^-?\d+$')"""),
          ("p6_year", "error",
            """year_col IS NOT NULL AND year_col NOT IN ('Unknown')
               AND (NOT regexp_matches(year_col, '^\d{4}$') OR TRY_CAST(year_col AS INT) > 2026)"""),
          ("p16_allele", "error",
            """allele IS NOT NULL AND NOT regexp_matches(allele, '(?i)^([ATCGN]+|-+)$')"""),
          ("p18_chromosome", "error",
            """chrom IS NULL OR chrom NOT IN ('1','2','3','4','5','6','7','8','9','10','11','12',
               '13','14','15','16','17','18','19','20','21','22','X','Y','MT')"""),
          ("p19_start_end", "warning",
            """start_pos IS NOT NULL AND end_pos IS NOT NULL AND start_pos > end_pos""")
        ).map { case (rule, sev, viol) =>
          s"""SELECT '$rule' AS rule, '$sev' AS severity,
              COUNT(CASE WHEN $viol THEN 1 END) AS n_violations,
              MIN(CASE WHEN $viol THEN CAST(doc_id AS VARCHAR) END) AS example FROM d"""
        }.mkString("\n UNION ALL \n")
        s"""WITH d AS (
             SELECT doc_id,
                    CASE WHEN doc_id % 11 = 0 THEN lang || ';INVALID' ELSE lang END AS multi_val,
                    CASE WHEN doc_id % 13 = 0 THEN '2199'
                         WHEN doc_id % 17 = 0 THEN 'Unknown'
                         ELSE '19' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') END AS year_col,
                    (['ATCG','N','-','xx','NA','GG'])[CAST(doc_id % 6 AS INT) + 1] AS allele,
                    CAST(doc_id % 25 AS VARCHAR) AS chrom,
                    n_chars AS start_pos,
                    CASE WHEN doc_id % 19 = 0 THEN n_chars - 5 ELSE n_chars + 10 END AS end_pos,
                    CASE WHEN doc_id % 23 = 0 THEN 'x' || CAST(doc_id AS VARCHAR)
                         ELSE CAST(doc_id AS VARCHAR) END AS int_col
             FROM documents)
           $ruleRows"""
      },

      "f4_cis_flags" ->
        """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, value FROM events),
           d AS (SELECT user_id,
                        ts_ms - LAG(ts_ms) OVER w AS td,
                        value - LAG(value) OVER w AS vd
                 FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id))
           SELECT user_id,
                  COUNT(CASE WHEN td IS NOT NULL AND td > 0 AND td < 6000
                             AND ABS(vd / 100.0) < 0.05 THEN 1 END) AS n_flagged,
                  COUNT(*) AS n_events
           FROM d GROUP BY user_id""",

      "f10_sample_subset" ->
        """SELECT source, COUNT(*) AS n_kept, COUNT(DISTINCT lang) AS n_langs
           FROM documents
           WHERE doc_id IN (SELECT doc_id FROM documents
                            WHERE lang IN ('en','fr') AND doc_id % 3 = 0)
           GROUP BY source""",

      "j2_outer_merge" ->
        """WITH l AS (SELECT l_partkey % 40 AS gene, l_quantity, l_orderkey FROM lineitem),
           a AS (SELECT gene, CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS qty_a
                 FROM l WHERE l_orderkey % 2 = 0 GROUP BY gene),
           b AS (SELECT gene, CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS qty_b
                 FROM l WHERE l_orderkey % 2 = 1 GROUP BY gene)
           SELECT gene, COALESCE(qty_a, 0.0) AS qty_a, COALESCE(qty_b, 0.0) AS qty_b
           FROM a FULL OUTER JOIN b USING (gene)""",

      "text_bpe_tokens" ->
        """SELECT doc_id,
                  len(regexp_split_to_array(trim(text), '\s+')) AS n_ws_tokens,
                  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS n_bpe_tokens
           FROM documents""",

      "dedup_embedding_neardup" -> {
        val bucket = (0 until 12).map(i => s"CASE WHEN embedding[${i + 1}] >= 0 THEN ${1L << i} ELSE 0 END")
          .mkString(" + ")
        s"""WITH b AS (SELECT vec_id, embedding, $bucket AS bucket FROM embeddings),
           pairs AS (
             SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
                    ROUND(
                      list_sum(list_transform(range(1, 65), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b2.embedding[i] AS DOUBLE)))
                      / (SQRT(list_sum(list_transform(range(1, 65), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
                         * SQRT(list_sum(list_transform(range(1, 65), i -> CAST(b2.embedding[i] AS DOUBLE) * CAST(b2.embedding[i] AS DOUBLE))))), 6) AS cos
             FROM b a JOIN b b2 USING (bucket) WHERE a.vec_id < b2.vec_id)
           SELECT id_a, id_b, cos FROM pairs WHERE cos >= 0.35"""
      },

      "sim_ivf_label" ->
        """WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec, label FROM embeddings WHERE vec_id < 10),
                c AS (SELECT vec_id AS c_id, embedding AS c_vec, label FROM embeddings),
           scored AS (
             SELECT q_id, c_id,
                    list_sum(list_transform(range(1, 65), i -> CAST(q_vec[i] AS DOUBLE) * CAST(c_vec[i] AS DOUBLE)))
                    / (SQRT(list_sum(list_transform(range(1, 65), i -> CAST(q_vec[i] AS DOUBLE) * CAST(q_vec[i] AS DOUBLE))))
                       * SQRT(list_sum(list_transform(range(1, 65), i -> CAST(c_vec[i] AS DOUBLE) * CAST(c_vec[i] AS DOUBLE))))) AS score
             FROM q JOIN c USING (label) WHERE q_id <> c_id)
           SELECT q_id, c_id, ROUND(score, 6) AS score,
                  CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, c_id ASC) AS INT) AS rank
           FROM scored
           QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, c_id ASC) <= 3""",

      "cna_melt_merge" -> {
        val srcList = (0 until 20).map(i => s"'src$i'").mkString(", ")
        s"""WITH langs AS (SELECT DISTINCT lang FROM documents),
           srcs AS (SELECT UNNEST([$srcList]) AS source),
           counts AS (SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY 1, 2)
           SELECT l.lang AS hugo_symbol, s.source AS sample_id, c.n AS value
           FROM langs l CROSS JOIN srcs s
           LEFT JOIN counts c ON c.lang = l.lang AND c.source = s.source"""
      },

      "bed_remap_90pct" ->
        """WITH genes AS (
             SELECT p_brand AS sym,
                    CAST(FLOOR(MIN(p_retailprice)) AS BIGINT) AS gs,
                    CAST(FLOOR(MAX(p_retailprice)) AS BIGINT) AS ge
             FROM part GROUP BY p_brand),
           regions AS (
             SELECT DISTINCT
                    CAST(FLOOR(l_extendedprice / greatest(l_quantity, 1.0)) AS BIGINT) AS rs,
                    CAST(FLOOR(l_extendedprice / greatest(l_quantity, 1.0)) AS BIGINT) + 50 AS re
             FROM lineitem WHERE l_orderkey % 50 = 0),
           joined AS (
             SELECT r.rs, r.re, g.sym, g.gs,
                    CASE WHEN g.sym IS NOT NULL THEN
                      CAST(LEAST(r.re, g.ge) - GREATEST(r.rs, g.gs) + 1 AS DOUBLE)
                        / CAST(r.re - r.rs + 1 AS DOUBLE) END AS ratio
             FROM regions r LEFT JOIN genes g ON r.rs <= g.ge AND r.re >= g.gs),
           best AS (
             SELECT rs, re, sym, ratio,
                    ROW_NUMBER() OVER (PARTITION BY rs
                      ORDER BY ratio DESC NULLS LAST, gs ASC NULLS LAST, sym ASC NULLS LAST) AS rn
             FROM joined)
           SELECT COALESCE(ratio >= 0.9, FALSE) AS IN_GENE,
                  CASE WHEN COALESCE(ratio >= 0.9, FALSE) THEN sym ELSE 'submitted' END AS hugo_symbol,
                  COUNT(*) AS n_regions
           FROM best WHERE rn = 1
           GROUP BY 1, 2""",

      "mm_binary_meta" ->
        """SELECT doc_id, strlen(text) AS n_bytes,
                  strlen(text) % 64 + 1 AS fake_width,
                  strlen(text) % 7 + 1 AS fake_frames
           FROM documents"""
    )
  }
}
