package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{DedupFunctions, TextFunctions}
import graft.operators.{RangeJoin, Upsert}

/** Property-based invariants (SURVEY §5 test plan item b). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic sampling bridge (scalatestplus bridge unavailable
    * offline): draw `n` seeded samples from a generator.
    */
  private def forSamples[T](gen: Gen[T], n: Int = 10)(f: T => Unit): Unit =
    (0 until n).foreach { i =>
      f(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private val intervalGen = for {
    chrom <- Gen.oneOf("1", "2")
    start <- Gen.choose(0L, 500L)
    len   <- Gen.choose(0L, 120L)
  } yield (chrom, start, start + len)

  test("property: binned overlap == broadcast overlap for random intervals") {
    val caseGen = for {
      ls  <- Gen.listOfN(25, intervalGen)
      rs  <- Gen.listOfN(12, intervalGen)
      bin <- Gen.oneOf(16L, 64L, 257L)
    } yield (ls, rs, bin)
    forSamples(caseGen) { case (ls, rs, bin) =>
      val l = ls.zipWithIndex.map { case ((c, s, e), i) => (c, s, e, i) }
        .toDF("chrom", "l_start", "l_end", "l_id")
      val r = rs.zipWithIndex.map { case ((c, s, e), i) => (c, s, e, i) }
        .toDF("chrom", "r_start", "r_end", "r_id")
      val binned = RangeJoin.binnedOverlap(l, r, "chrom", "l_start", "l_end",
        "r_start", "r_end", bin).select("l_id", "r_id")
        .as[(Int, Int)].collect().sorted.toSeq
      val bcast = RangeJoin.broadcastOverlap(l, r, "chrom", "l_start", "l_end",
        "r_start", "r_end").select("l_id", "r_id")
        .as[(Int, Int)].collect().sorted.toSeq
      assert(binned == bcast)
    }
  }

  private val rowGen = Gen.listOfN(20, for {
    id <- Gen.choose(0, 12)
    v  <- Gen.alphaNumStr.map(_.take(4))
  } yield (id, v))

  test("property: upsert merge contains exactly the incoming PKs (allowDelete)") {
    forSamples(Gen.zip(rowGen, rowGen)) { case (inc, ex) =>
      val incoming = inc.distinctBy(_._1).toDF("id", "v")
      val existing = ex.distinctBy(_._1).toDF("id", "v")
      val d = Upsert.diff(incoming, existing, Seq("id"))
      val incIds = inc.distinctBy(_._1).map(_._1).toSet
      val exIds  = ex.distinctBy(_._1).map(_._1).toSet
      assert(d.appends.select("id").as[Int].collect().toSet == incIds.diff(exIds))
      assert(d.deletes.select("id").as[Int].collect().toSet == exIds.diff(incIds))
      val merged = Upsert.merge(incoming, existing, Seq("id"), allowDelete = false)
        .select("id").as[Int].collect().toSet
      assert(merged == incIds.union(exIds))
    }
  }

  private val textGen = Gen.listOfN(12,
    Gen.oneOf("alpha", "beta", "gamma", "delta", "zeta")).map(_.mkString(" "))

  test("property: jaccard bounds, symmetry, and self-similarity") {
    forSamples(Gen.zip(textGen, textGen)) { case (a, b) =>
      val df = Seq((a, b)).toDF("a", "b")
      val Seq(shA, shB) = Seq("a", "b").map(c => TextFunctions.shingles(col(c), 2))
      val r = df.select(
        DedupFunctions.jaccard(shA, shB).as("ab"),
        DedupFunctions.jaccard(shB, shA).as("ba"),
        DedupFunctions.jaccard(shA, shA).as("aa")).collect()(0)
      assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0)
      assert(r.getDouble(0) == r.getDouble(1))
      assert(r.getDouble(2) == 1.0)
    }
  }

  test("property: identical token multisets share minhash signatures") {
    forSamples(textGen) { a =>
      val shuffled = scala.util.Random.shuffle(a.split(" ").toList).mkString(" ")
      val df = Seq((a, shuffled)).toDF("a", "b")
      val r = df.select(
        graft.plans.MinHashSignature.signature(array_distinct(TextFunctions.tokens(col("a"))), 6).as("sa"),
        graft.plans.MinHashSignature.signature(array_distinct(TextFunctions.tokens(col("b"))), 6).as("sb"))
        .collect()(0)
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }
}
