package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{DedupFunctions, TextFunctions}

class ShingleHashExpressionSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over a lazy dog"),
    (3L, "one two"),                 // fewer tokens than n
    (4L, ""),                        // empty → single empty shingle
    (5L, "  leading and trailing  "),
    (6L, "\tTab\nand newline separated Words"),
    (7L, "repeat repeat repeat repeat repeat repeat"), // collapsing grams
    (8L, "MiXeD CaSe TEXT mixed case text mixed case")
  ).toDF("doc_id", "text")

  test("hash-set cardinality equals the string shingle set, n=3 and n=5") {
    for (n <- Seq(3, 5)) {
      val both = docs.select(
        size(ShingleHashExpr.shingleHashes(col("text"), n)).as("h"),
        size(array_distinct(TextFunctions.shingles(col("text"), n))).as("s"))
      assert(both.filter(col("h") =!= col("s")).isEmpty,
        s"n=$n: hash-set size diverged from string-set size")
    }
  }

  test("pairwise jaccard identical through hashes and strings") {
    val h = docs.select(col("doc_id"),
      ShingleHashExpr.shingleHashes(col("text"), 3).as("sh"))
    val s = docs.select(col("doc_id"),
      array_distinct(TextFunctions.shingles(col("text"), 3)).as("sh"))
    def pairs(df: org.apache.spark.sql.DataFrame) = {
      val a = df.select(col("doc_id").as("ia"), col("sh").as("sa"))
      val b = df.select(col("doc_id").as("ib"), col("sh").as("sb"))
      a.join(b, col("ia") < col("ib"))
        .select(col("ia"), col("ib"),
          round(DedupFunctions.jaccard(col("sa"), col("sb")), 9).as("j"))
    }
    val diff = pairs(h).as("x").join(pairs(s).as("y"), Seq("ia", "ib"))
      .filter(col("x.j") =!= col("y.j"))
    assert(diff.isEmpty, "hashed jaccard diverged from string jaccard")
    // sanity: docs 1 and 2 really are near-dups with jaccard in (0,1)
    val j12 = pairs(h).filter(col("ia") === 1 && col("ib") === 2)
      .select("j").as[Double].head()
    assert(j12 >= 0.4 && j12 < 1.0)
  }

  test("distinct hashes are sorted and deduped; null text → null") {
    val r = docs.filter(col("doc_id") === 7)
      .select(ShingleHashExpr.shingleHashes(col("text"), 3).as("h"))
      .as[Seq[Long]].head()
    assert(r == r.sorted && r.size == r.distinct.size)
    assert(r.size == 1, "six repeats of one token have exactly one distinct 3-gram")
    val n = Seq((1L, null: String)).toDF("id", "text")
      .select(ShingleHashExpr.shingleHashes(col("text"), 3))
      .head().isNullAt(0)
    assert(n, "null text must stay null")
  }

  test("positional variant: document order, duplicates kept, set-projects to the distinct variant") {
    for (n <- Seq(2, 3)) {
      // positional STRING grams (no dedup — TextFunctions.shingles
      // array_distincts, so build the raw sequence inline)
      val toks = split(trim(lower(col("text"))), "\\s+")
      val strSeq = when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => array_join(slice(toks, i + 1, lit(n)), " ")))
        .otherwise(array(array_join(toks, " ")))
      val both = docs.select(col("doc_id"),
        ShingleHashExpr.shingleHashesSeq(col("text"), n).as("seq"),
        ShingleHashExpr.shingleHashes(col("text"), n).as("set"),
        strSeq.as("strs"))
        .collect()
      both.foreach { r =>
        val seq = r.getSeq[Long](1)
        val set = r.getSeq[Long](2)
        val strs = r.getSeq[String](3)
        assert(seq.distinct.sorted == set,
          s"n=$n doc ${r.getLong(0)}: seq must set-project to the distinct variant")
        assert(seq.size == strs.size,
          s"n=$n doc ${r.getLong(0)}: positional length must equal the string gram count")
        // equal string grams <-> equal hashes, position for position
        for (i <- strs.indices; j <- strs.indices)
          assert((strs(i) == strs(j)) == (seq(i) == seq(j)),
            s"n=$n doc ${r.getLong(0)}: positions $i,$j hash/string equality diverged")
      }
    }
    // six repeats of one token: five identical 2-gram hashes IN ORDER
    val rep = docs.filter(col("doc_id") === 7)
      .select(ShingleHashExpr.shingleHashesSeq(col("text"), 2))
      .as[Seq[Long]].head()
    assert(rep.size == 5 && rep.distinct.size == 1)
  }
}
