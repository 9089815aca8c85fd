package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Bucketing

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation equals plain aggregation") {
    val df = (1 to 2000).map(i => (if (i % 10 == 0) "hot" else s"k${i % 37}", i.toDouble))
      .toDF("k", "v")
    val plain = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .as[(String, Long, Double)].collect().toSet
    val salted = Skew.saltedAgg(df, Seq("k"), salts = 8, Seq(
      ("n", count(lit(1)), (c: org.apache.spark.sql.Column) => sum(c)),
      ("s", sum($"v"), (c: org.apache.spark.sql.Column) => sum(c))))
      .as[(String, Long, Double)].collect().toSet
    assert(salted == plain)
  }

  test("salted join equals plain join") {
    val big = (1 to 500).map(i => (s"k${i % 5}", i)).toDF("k", "i")
    val small = Seq(("k0", "a"), ("k1", "b"), ("k2", "c"), ("k3", "d"), ("k4", "e"))
      .toDF("k", "tag")
    val plain = big.join(small, "k").select("k", "i", "tag")
      .as[(String, Int, String)].collect().toSet
    val salted = Skew.saltedJoin(big, small, "k", salts = 4).select("k", "i", "tag")
      .as[(String, Int, String)].collect().toSet
    assert(salted == plain)
  }

  test("bucketed join plans without an exchange on the bucketed sides") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = (1 to 100).map(i => (i.toLong, s"a$i")).toDF("id", "va")
      val b = (1 to 100).map(i => (i.toLong, s"b$i")).toDF("id", "vb")
      Bucketing.writeBucketed(a, "bucketed_a", "id", 4)
      Bucketing.writeBucketed(b, "bucketed_b", "id", 4)
      val joined = Bucketing.read(spark, "bucketed_a")
        .join(Bucketing.read(spark, "bucketed_b"), "id")
      assert(Bucketing.isExchangeFree(joined), joined.queryExecution.executedPlan.toString)
      assert(joined.count() == 100)

      // control: the same join on raw (non-bucketed) frames DOES shuffle
      val control = a.join(b, "id")
      assert(!Bucketing.isExchangeFree(control))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bucketed_a")
      spark.sql("DROP TABLE IF EXISTS bucketed_b")
    }
  }

  test("banded LSH: OR-construction recall + per-band bucket bounds on correlated vectors") {
    import graft.functions.VectorFunctions
    // adversarial corpus: dims 0-7 all positive (a single table hashing
    // them collapses to ONE bucket — the skew/recall cliff); dims 8-15
    // encode the id bits (spread). i and i+128 share all dims → true dups.
    val vecs = (0 until 256).map { i =>
      val base = i % 128
      (i.toLong, Array.tabulate(16) { d =>
        if (d < 8) 1.0f else if (((base >> (d - 8)) & 1) == 0) 1.0f else -1.0f
      })
    }
    val df = vecs.toDF("vec_id", "embedding")

    // band 0 (dims 0-7) is degenerate: one bucket holds everything;
    // band 1 (dims 8-15) splits into 128 buckets of exactly 2
    val keyed = df.select($"vec_id",
      explode(VectorFunctions.bandedSignBuckets($"embedding", 2, 8)).as("bk"))
    val sizes = keyed.groupBy("bk").count()
      .select(shiftright($"bk", 32).cast("int").as("band"), $"count")
      .groupBy("band").agg(max("count").as("max_bucket"))
      .as[(Int, Long)].collect().toMap
    assert(sizes(0) == 256L) // the cliff a single table would hit
    assert(sizes(1) == 2L)   // banding bounds candidates per band

    // OR-construction recall: every true dup pair (i, i+128) survives
    val pairs = VectorFunctions.bandedNearDup(df, "vec_id", "embedding",
      bands = 2, bitsPerBand = 8, minCos = 0.999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    (0 until 128).foreach { i => assert(pairs.contains((i.toLong, (i + 128).toLong))) }
  }
}
