package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WinnowExpressionSpec extends SparkSpec {
  import spark.implicits._

  private def winnowOf(texts: String*): Seq[Seq[Long]] =
    texts.toSeq.toDF("text")
      .select(WinnowExpr.winnow(col("text"), 5, 4).as("fp"))
      .as[Seq[Long]].collect().toSeq

  test("guarantee: documents sharing a run of >= w+k-1 chars share a hash") {
    // w+k-1 = 8: a shared 20-char run must produce at least one common pick
    val shared = "the quick brown fox "
    val Seq(a, b) = winnowOf(s"AAAA $shared BBBB", s"XXXXXX $shared YYYY")
    assert(a.toSet.intersect(b.toSet).nonEmpty)
    // disjoint texts share nothing
    val Seq(c, d) = winnowOf("abcdefghijklmnop", "qrstuvwxyz123456")
    assert(c.toSet.intersect(d.toSet).isEmpty)
  }

  test("sparsity: ~1/w positions selected, sorted distinct output") {
    val text = (1 to 200).map(i => ('a' + i % 26).toChar).mkString
    val Seq(fp) = winnowOf(text)
    val nGrams = text.length - 4
    assert(fp.length <= nGrams / 2, s"selected ${fp.length} of $nGrams")
    assert(fp == fp.sorted && fp.distinct == fp)
  }

  test("portability rules: ASCII strip-then-lower, short/empty inputs") {
    // case-insensitive, and non-ASCII/control chars dropped before hashing
    val Seq(lo, hi, noisy) = winnowOf("Hello World docs", "HELLO WORLD DOCS",
      "Héllo\tWorld docs")
    assert(lo == hi)
    // é and tab are dropped, but the trailing "World docs" run (10 chars,
    // >= w+k-1 = 8) still guarantees a shared pick
    assert(lo.toSet.intersect(noisy.toSet).nonEmpty)
    // nbsp is DROPPED, not mapped to space — same char stream as deleting it
    val Seq(nb, del) = winnowOf("Hello\u00a0World docs", "HelloWorld docs")
    assert(nb == del)
    // interpreted (non-codegen) path agrees with whole-stage codegen
    val interp = {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      try winnowOf("Héllo\tWorld docs")
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
    assert(interp.head == noisy)
    // < k printable chars → empty; < w grams → single global min
    val Seq(empty, tiny, sub) = winnowOf("ab☃", "abcdef", "abcdefg")
    assert(empty.isEmpty)
    assert(tiny.length == 1 && sub.length == 1)
    // the single pick is the global min of the gram hashes
    assert(tiny.head == math.min("abcde".foldLeft(0L)(_ * 31 + _),
      "bcdef".foldLeft(0L)(_ * 31 + _)))
  }
}
