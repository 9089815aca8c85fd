package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val steps = Seq("view", "click", "buy")

  test("conversion: strict time order, out-of-order events don't count") {
    val ev = Seq(
      // user 1 completes the whole funnel in order
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "buy"),
      // user 2 clicks BEFORE viewing: click must not count
      (2L, 5L, "click"), (2L, 10L, "view"),
      // user 3 views only
      (3L, 1L, "view"),
      // user 4 never enters the funnel (no view) despite click+buy
      (4L, 1L, "click"), (4L, 2L, "buy"),
      // noise types are ignored
      (1L, 15L, "error")
    ).toDF("user_id", "ts_ms", "event_type")
    val got = Funnel.conversion(ev, "user_id", "ts_ms", "event_type", steps)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set((1L, "view", 3L), (2L, "click", 1L), (3L, "buy", 1L)))
  }

  test("ties and re-entry: equal timestamps are not 'later'; first view anchors") {
    val ev = Seq(
      // click at the SAME ts as the view — strictly-later fails
      (1L, 10L, "view"), (1L, 10L, "click"),
      // a second view later must not re-anchor user 2's funnel
      (2L, 10L, "view"), (2L, 50L, "view"), (2L, 20L, "click")
    ).toDF("user_id", "ts_ms", "event_type")
    val slots = Funnel.userSlots(ev, "user_id", "ts_ms", "event_type", steps)
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    assert(slots(1L) == Seq(10L, null, null))
    assert(slots(2L) == Seq(10L, 20L, null))
  }

  test("windowMs: later steps must land within the window of the first step") {
    val ev = Seq(
      (1L, 0L, "view"), (1L, 50L, "click"), (1L, 200L, "buy"), // buy outside
      (2L, 0L, "view"), (2L, 90L, "click"), (2L, 100L, "buy") // all inside
    ).toDF("user_id", "ts_ms", "event_type")
    val got = Funnel.conversion(ev, "user_id", "ts_ms", "event_type", steps,
        windowMs = Some(100L))
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(got == Map("view" -> 2L, "click" -> 2L, "buy" -> 1L))
  }

  test("funnel counts are monotonically non-increasing down the steps") {
    val rnd = new scala.util.Random(7)
    val ev = (0 until 2000).map { _ =>
      (rnd.nextInt(50).toLong, rnd.nextInt(1000).toLong,
        steps(rnd.nextInt(3)))
    }.toDF("user_id", "ts_ms", "event_type")
    val counts = Funnel.conversion(ev, "user_id", "ts_ms", "event_type", steps)
      .orderBy("step").collect().map(_.getLong(2))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }
}
