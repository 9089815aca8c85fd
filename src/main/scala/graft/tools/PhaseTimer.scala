package graft.tools

/** Phase-timing side channel between query builders and the bench
  * harness. Index-lifecycle queries execute their build/merge phases
  * EAGERLY inside the builder (saveBm25Index, mergeIvfDelta, ...), so a
  * single end-to-end timing buries the operationally relevant number —
  * the query path — under one-time construction cost. Builders wrap
  * those eager steps in [[phase]]; [[graft.Bench]] drains the recorded
  * phases after each run and reports build/merge/query separately.
  *
  * Driver-side only (builders run on the driver; executors never touch
  * this). `drain` clears, so stale phases from warmups or failed runs
  * never leak into the next measurement.
  */
object PhaseTimer {
  private val buf = new java.util.concurrent.ConcurrentLinkedQueue[(String, Double)]()

  def phase[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    try f finally buf.add(name -> (System.nanoTime() - t0) / 1e9)
  }

  /** All phases recorded since the last drain, aggregated by name. */
  def drain(): Map[String, Double] = {
    val out = scala.collection.mutable.Map[String, Double]()
    var e = buf.poll()
    while (e != null) {
      out(e._1) = out.getOrElse(e._1, 0.0) + e._2
      e = buf.poll()
    }
    out.toMap
  }
}
