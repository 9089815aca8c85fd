package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // left: (key, ts, tag) / right: (key, ts, price)
  private val left = Seq(
    ("a", 10L, "l1"), ("a", 20L, "l2"), ("a", 5L, "l3"),
    ("b", 100L, "l4"), ("c", 7L, "l5")
  ).toDF("k", "ts", "tag")

  private val right = Seq(
    ("a", 8L, 1.0), ("a", 10L, 2.0), ("a", 15L, 3.0),
    ("b", 200L, 4.0)
  ).toDF("k", "rts", "price")

  test("backward: latest right row at or before each left ts, else null") {
    val got = AsOfJoin.backward(left, right, Seq("k"), "ts", "rts",
      Seq("price", "rts"))
      .select("tag", "asof_price", "asof_rts")
      .as[(String, Option[Double], Option[Long])].collect().toSet
    assert(got == Set(
      ("l1", Some(2.0), Some(10L)), // equal ts matches (inclusive)
      ("l2", Some(3.0), Some(15L)),
      ("l3", None, None),           // nothing at or before 5
      ("l4", None, None),           // right exists only after
      ("l5", None, None)))          // key with no right rows
  }

  test("forward: earliest right row at or after each left ts") {
    val got = AsOfJoin.forward(left, right, Seq("k"), "ts", "rts",
      Seq("price"))
      .select("tag", "asof_price")
      .as[(String, Option[Double])].collect().toSet
    assert(got == Set(
      ("l1", Some(2.0)),            // equal ts matches (inclusive)
      ("l2", None),                 // nothing at or after 20
      ("l3", Some(1.0)),
      ("l4", Some(4.0)),
      ("l5", None)))
  }

  test("tolerance nulls out matches that are too far back") {
    val got = AsOfJoin.backward(left, right, Seq("k"), "ts", "rts",
      Seq("price"), tolerance = Some(3L))
      .select("tag", "asof_price")
      .as[(String, Option[Double])].collect().toSet
    // l2@20 matched 15 (gap 5 > 3) → nulled; l1@10 matched 10 (gap 0) → kept
    assert(got("l1" -> Some(2.0)) && got("l2" -> None))
  }

  test("matches a naive per-row scan on pseudorandom data") {
    var s = 99L
    def next(m: Long): Long = { s = (s * 6364136223846793005L + 1442695040888963407L) & Long.MaxValue; s % m }
    val lrows = (1 to 300).map(i => (next(5), next(1000), i.toLong))
    val rrows = (1 to 200).map(i => (next(5), next(1000), i * 10L))
    // right side unique on (key, ts) — required for determinism
    val runiq = rrows.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq

    val l = lrows.toDF("k", "ts", "lid")
    val r = runiq.toDF("k", "rts", "rid")
    val got = AsOfJoin.backward(l, r, Seq("k"), "ts", "rts", Seq("rid"))
      .select("lid", "asof_rid").as[(Long, Option[Long])].collect().toMap

    val expected = lrows.map { case (k, ts, lid) =>
      val cand = runiq.filter(rr => rr._1 == k && rr._2 <= ts)
      lid -> (if (cand.isEmpty) None else Some(cand.maxBy(_._2)._3))
    }.toMap
    assert(got == expected)
  }

  test("plan: no join node, exactly one shuffle on the key") {
    val df = AsOfJoin.backward(left, right, Seq("k"), "ts", "rts", Seq("price"))
    val logical = df.queryExecution.optimizedPlan
    assert(logical.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.isEmpty, "as-of must not plan a join node")
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val exchanges = formatted.linesIterator.count(l =>
      l.contains(") Exchange") && !l.contains("Reuse"))
    assert(exchanges == 1, s"expected 1 shuffle, plan:\n$formatted")
  }
}
