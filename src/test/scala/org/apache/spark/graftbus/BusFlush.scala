package org.apache.spark.graftbus

import org.apache.spark.SparkContext

/** Test-only bridge into `SparkContext.listenerBus` (private[spark]):
  * QueryExecutionListener callbacks ride the async listener bus, so a
  * spec that asserts over captured QueryExecutions must drain the bus
  * before reading its capture buffer — exactly what Spark's own suites
  * do with `waitUntilEmpty`.
  */
object BusFlush {
  def flush(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
