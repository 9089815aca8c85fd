package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val ids = (1L to 2000L).toDF("id")

  test("splitAssign: deterministic, total, and near the target fractions") {
    val w = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val assigned = ids.select(col("id"), Sampling.splitAssign(col("id"), w).as("s"))
    val counts = assigned.groupBy("s").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 2000L)
    assert(math.abs(counts("train") - 1600L) < 100, s"train=${counts("train")}")
    assert(math.abs(counts("val") - 200L) < 60 && math.abs(counts("test") - 200L) < 60)
    // re-evaluation yields the identical assignment (pure hash, no rand)
    val again = ids.select(col("id"), Sampling.splitAssign(col("id"), w).as("s"))
    assert(assigned.except(again).isEmpty && again.except(assigned).isEmpty)
    // a different salt reshuffles the assignment
    val salted = ids.select(col("id"), Sampling.splitAssign(col("id"), w, salt = "x").as("s"))
    assert(salted.except(assigned).count() > 0)
  }

  test("hamiltonApportion: sums to budget, proportional, deterministic ties") {
    // exact proportionality when weights divide the budget
    val even = Sampling.hamiltonApportion(
      Seq("a" -> BigInt(1), "b" -> BigInt(3)), 400L)
    assert(even == Map("a" -> 100L, "b" -> 300L))
    // leftovers go to the LARGEST remainders: quotas 3.33/3.33/3.33
    // → floors 3/3/3, one leftover, equal remainders break on key asc
    val tie = Sampling.hamiltonApportion(
      Seq("c" -> BigInt(1), "a" -> BigInt(1), "b" -> BigInt(1)), 10L)
    assert(tie.values.sum == 10L && tie("a") == 4L)
    // input order never matters
    val w = Seq("x" -> BigInt(7), "y" -> BigInt(2), "z" -> BigInt(5))
    assert(Sampling.hamiltonApportion(w, 997L) ==
      Sampling.hamiltonApportion(w.reverse, 997L))
    assert(Sampling.hamiltonApportion(w, 997L).values.sum == 997L)
    // a zero-weight stratum exists but gets nothing unless a leftover
    // lands on it (remainder 0 sorts last)
    val withZero = Sampling.hamiltonApportion(
      Seq("a" -> BigInt(0), "b" -> BigInt(5)), 7L)
    assert(withZero == Map("a" -> 0L, "b" -> 7L))
    intercept[IllegalArgumentException] {
      Sampling.hamiltonApportion(Seq("a" -> BigInt(0)), 5L)
    }
  }

  test("rateKeep: keep fraction tracks the rate per stratum") {
    val df = ids.withColumn("stratum", (col("id") % 2 === 0).cast("string"))
    val rate = when(col("stratum") === "true", lit(0.2)).otherwise(lit(0.9))
    val kept = df.filter(Sampling.rateKeep(col("id"), rate))
      .groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(math.abs(kept("true") - 200L) < 60, s"got ${kept("true")}")
    assert(math.abs(kept("false") - 900L) < 60, s"got ${kept("false")}")
  }

  test("perGroupSample: exactly min(k, group size) rows per group, stable") {
    val df = (1L to 100L).map(i => (i, s"g${i % 7}")).toDF("id", "g")
    val s1 = Sampling.perGroupSample(df, Seq("g"), "id", k = 3)
    val sizes = s1.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(sizes.values.forall(_ == 3L) && sizes.size == 7)
    val tiny = Sampling.perGroupSample(Seq((1L, "a"), (2L, "a")).toDF("id", "g"),
      Seq("g"), "id", k = 5)
    assert(tiny.count() == 2)
    // deterministic across evaluations
    val s2 = Sampling.perGroupSample(df, Seq("g"), "id", k = 3)
    assert(s1.collect().toSet == s2.collect().toSet)
  }

  test("dsirSelect: target-like docs outrank off-target; deterministic; literal weights") {
    // two disjoint vocabularies: "medical" target vs "legal" background;
    // mixed docs land between the two poles
    val docs = ((1L to 40L).map(i => (i, s"dose patient trial dose symptom$i", "t")) ++
      (41L to 80L).map(i => (i, s"clause herein party witness claim$i", "b")) ++
      (81L to 90L).map(i => (i, s"dose patient clause herein mix$i", "m")))
      .toDF("doc_id", "text", "grp")
    val sel = Sampling.dsirSelect(docs, "doc_id", "text",
      targetFilter = col("grp") === "t", dims = 64, k = 50)
    val ranked = sel.join(docs.select("doc_id", "grp"), "doc_id")
      .select("rank", "grp", "log_w").as[(Long, String, Double)]
      .collect().sortBy(_._1)
    assert(ranked.length == 50)
    // every target doc scores above every background doc; mixed in between
    val byGrp = ranked.groupBy(_._2).view.mapValues(_.map(_._3)).toMap
    assert(byGrp("t").min > byGrp.getOrElse("m", Array(Double.NegativeInfinity)).max)
    assert(!byGrp.contains("b") ||
      byGrp("b").max < byGrp("m").min,
      "background must rank below mixed docs")
    // top 40 are exactly the target docs (tie-broken by id)
    assert(ranked.take(40).forall(_._2 == "t"))
    // deterministic across evaluations
    val again = Sampling.dsirSelect(docs, "doc_id", "text",
      col("grp") === "t", 64, 50).select("doc_id", "log_w", "rank")
      .as[(Long, Double, Long)].collect().toSet
    assert(again == sel.select("doc_id", "log_w", "rank")
      .as[(Long, Double, Long)].collect().toSet)
    // the scoring scan carries the weight vector as a literal: no join,
    // no shuffle between the documents scan and the scoring projection
    val plan = Sampling.dsirSelect(docs, "doc_id", "text",
      col("grp") === "t", 64, 5).queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("join"),
      s"scoring must not join a weight table:\n$plan")
  }

  test("budgetSelect: two-level prefix sum == naive global-order window") {
    // scores with heavy ties + varied costs; id is the tiebreak
    val df = (1L to 500L).map { i =>
      (i, math.floor((i * 37 % 100) / 10.0) / 10.0, (i * 13 % 50) + 1)
    }.toDF("id", "score", "cost")
    val got = Sampling.budgetSelect(df, col("score"), col("id"), col("cost"),
        budget = 3000L)
      .select("id", "cum_cost").as[(Long, Long)].collect().toMap
    val naive = df.withColumn("cum",
        sum(col("cost").cast("long")).over(Window.orderBy(col("score").desc, col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum") <= 3000L)
      .select("id", "cum").as[(Long, Long)].collect().toMap
    assert(got == naive)
    assert(got.nonEmpty && got.values.max <= 3000L)
  }

  test("budgetSelect: plan has no single-partition global window") {
    val df = (1L to 100L).map(i => (i, i / 10.0, 5L)).toDF("id", "score", "cost")
    val out = Sampling.budgetSelect(df, col("score"), col("id"), col("cost"), 100L)
    // r11 shape: NOTHING is cached (the bin totals come from their own
    // map-side-combined aggregation job, so the window shuffle runs
    // exactly once, lazily, in the returned plan) — the plan carries
    // the __bin-partitioned window and no unpartitioned window, and no
    // InMemoryRelation anywhere (the r10 persist leaked unless callers
    // honored the clearCache contract)
    val plan = out.queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty, s"expected the bin window in the plan:\n$plan")
    windows.foreach { w =>
      assert(w.partitionSpec.nonEmpty &&
        w.partitionSpec.exists(_.toString.contains("__bin")),
        s"window must partition by __bin:\n$w")
    }
    assert(plan.collect {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
    }.isEmpty, s"budgetSelect must not cache anything:\n$plan")
  }

  test("epochRepeat: whole copies guaranteed, hash fraction, zero drops, deterministic") {
    val df = (1L to 400L).toDF("id")
    // 2.0 epochs: exactly two copies of every row, copy_idx 0 and 1
    val two = Sampling.epochRepeat(df, col("id"), lit(20L))
      .groupBy("id").count().as[(Long, Long)].collect()
    assert(two.length == 400 && two.forall(_._2 == 2L))
    // 2.5 epochs: every row 2 or 3 copies, roughly half get the third
    val half = Sampling.epochRepeat(df, col("id"), lit(25L))
      .groupBy("id").count().as[(Long, Long)].collect()
    assert(half.forall(r => r._2 == 2L || r._2 == 3L))
    val thirds = half.count(_._2 == 3L)
    assert(thirds > 120 && thirds < 280, s"fraction off: $thirds/400")
    // 0.5 epochs: the SAME hash-half (salt-aligned with the 2.5 case)
    val down = Sampling.epochRepeat(df, col("id"), lit(5L))
      .select("id").as[Long].collect().toSet
    assert(down == half.filter(_._2 == 3L).map(_._1).toSet)
    // 0 epochs: nothing; deterministic across runs
    assert(Sampling.epochRepeat(df, col("id"), lit(0L)).isEmpty)
    val again = Sampling.epochRepeat(df, col("id"), lit(5L))
      .select("id").as[Long].collect().toSet
    assert(again == down)
  }

  test("epochShard: dense per-shard positions, deterministic, epoch re-deals") {
    val df = ids.withColumnRenamed("id", "doc_id")
    val e1 = Sampling.epochShard(df, "doc_id", nShards = 8, epoch = 1)
    // every row lands in exactly one shard in [0, 8)
    assert(e1.count() == 2000L)
    val shardRange = e1.agg(min("shard"), max("shard")).as[(Int, Int)].head()
    assert(shardRange._1 >= 0 && shardRange._2 < 8)
    // positions are dense 1..n within each shard
    val dense = e1.groupBy("shard")
      .agg(count("*").as("n"), max("pos").as("mx"), min("pos").as("mn"),
        countDistinct("pos").as("d"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1L || col("d") =!= col("n"))
    assert(dense.isEmpty, "positions not dense 1..n per shard")
    // pure hash: re-evaluation is identical
    val again = Sampling.epochShard(df, "doc_id", nShards = 8, epoch = 1)
    assert(e1.except(again).isEmpty && again.except(e1).isEmpty)
    // a different epoch re-deals the order (and generally the shards)
    val e2 = Sampling.epochShard(df, "doc_id", nShards = 8, epoch = 2)
    assert(e2.except(e1).count() > 0)
    // the window is partitioned by shard — no single-task global sort
    val windows = e1.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty))
  }

  test("weighted WoR: deterministic, and inclusion tracks weight across salts") {
    import graft.functions.Sampling
    val df = Seq((1L, "g", 9.0), (2L, "g", 1.0)).toDF("id", "grp", "w")
    // deterministic: same salt → same winner
    val first = Sampling.weightedSampleWoR(df, Seq("grp"), "id", col("w"), k = 1)
      .select("id").as[Long].collect()
    val second = Sampling.weightedSampleWoR(df, Seq("grp"), "id", col("w"), k = 1)
      .select("id").as[Long].collect()
    assert(first.sameElements(second) && first.length == 1)
    // inclusion probability ∝ weight: the 9:1 heavy row should win the
    // large majority of independent salts (expected 90%, bound loosely)
    val wins = (0 until 40).count { s =>
      Sampling.weightedSampleWoR(df, Seq("grp"), "id", col("w"), k = 1, salt = s"s$s")
        .select("id").as[Long].collect().head == 1L
    }
    assert(wins >= 28, s"heavy row won only $wins/40")
  }

  test("perGroupBudget: best-first per group until the budget is spent") {
    // group a: costs 10 each, scores 5..1 → budget 25 keeps top 2
    // group b: one row over budget alone → kept iff cost <= budget
    val df = Seq(
      ("a", 1L, 5.0, 10L), ("a", 2L, 4.0, 10L), ("a", 3L, 3.0, 10L),
      ("a", 4L, 2.0, 10L), ("a", 5L, 1.0, 10L),
      ("b", 6L, 9.0, 30L), ("b", 7L, 8.0, 1L)
    ).toDF("g", "id", "score", "cost")
    val sel = Sampling.perGroupBudget(df, Seq("g"), col("score"),
      col("id"), col("cost"), budget = 25L)
    val byGroup = sel.select("g", "id", "cum_cost")
      .as[(String, Long, Long)].collect().groupBy(_._1)
    // a keeps ids 1,2 (cum 10, 20); id 3 would hit 30 > 25
    assert(byGroup("a").map(_._2).sorted.toSeq == Seq(1L, 2L))
    assert(byGroup("a").map(_._3).sorted.toSeq == Seq(10L, 20L))
    // b's best row costs 30 > 25 → excluded, but the next (cum 31 from
    // 30+1? no — cum is order-dependent: 30 first, then 31) excluded too
    assert(!byGroup.contains("b"))
    // ties on score break by id ascending: equal scores keep lowest ids
    val ties = Seq(("t", 9L, 1.0, 10L), ("t", 8L, 1.0, 10L), ("t", 7L, 1.0, 10L))
      .toDF("g", "id", "score", "cost")
    val kept = Sampling.perGroupBudget(ties, Seq("g"), col("score"),
      col("id"), col("cost"), budget = 20L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(7L, 8L))
    // single window partitioned by the group key — no global sort
    val windows = sel.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty))
  }

  test("curriculumShard: buckets descend within every shard; epoch re-deals within buckets") {
    val df = (1L to 400L).map(i => (i, i % 4)).toDF("id", "qb")
    val c1 = Sampling.curriculumShard(df, "id", col("qb"), nShards = 4, epoch = 1)
      .select("id", "q_bucket", "shard", "pos")
      .as[(Long, Long, Int, Long)].collect()
    // within each shard, q_bucket is non-increasing as pos increases
    c1.groupBy(_._3).foreach { case (_, rows) =>
      val byPos = rows.sortBy(_._4).map(_._2)
      byPos.zip(byPos.tail).foreach { case (a, b) => assert(a >= b) }
    }
    // positions are a dense 1..n permutation per shard
    c1.groupBy(_._3).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // same epoch → identical; different epoch → same shard sizes per
    // bucket progression but a different within-bucket order somewhere
    val c1b = Sampling.curriculumShard(df, "id", col("qb"), nShards = 4, epoch = 1)
      .select("id", "q_bucket", "shard", "pos").as[(Long, Long, Int, Long)].collect()
    assert(c1.toSet == c1b.toSet)
    val c2 = Sampling.curriculumShard(df, "id", col("qb"), nShards = 4, epoch = 2)
      .select("id", "q_bucket", "shard", "pos").as[(Long, Long, Int, Long)].collect()
    assert(c2.toSet != c1.toSet)
  }

  test("grouped split: canonical-cluster members always share a split") {
    // the sample_split_grouped composition on synthetic variant pairs
    val docs = (1L to 300L).map(i => (i, s"Document Body $i with, punct!"))
      .toDF("doc_id", "text")
    val variants = docs.select(col("doc_id"),
        explode(array(col("text"), upper(col("text")))).as("v"))
      .select(col("doc_id"), md5(TextFunctions.normalizeText(col("v"))).as("ck"))
    val w = Window.partitionBy(col("ck"))
    val assigned = variants
      .withColumn("rep_id", min("doc_id").over(w))
      .select(col("doc_id"), col("ck"),
        Sampling.splitAssign(col("rep_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"))
    // every canonical cluster has 2 members and exactly ONE split value
    val perCluster = assigned.groupBy("ck")
      .agg(count(lit(1)).as("n"), countDistinct(col("split")).as("ns"))
      .as[(String, Long, Long)].collect()
    assert(perCluster.length == 300)
    assert(perCluster.forall(c => c._2 == 2L && c._3 == 1L))
    // and the split is the representative's: matches splitAssign(doc_id)
    val direct = docs.select(col("doc_id"),
      Sampling.splitAssign(col("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"))
    assert(assigned.select("doc_id", "split").distinct()
      .except(direct).isEmpty)
  }
}
