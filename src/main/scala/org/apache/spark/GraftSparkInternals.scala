package org.apache.spark

/** Measurement scaffolding for [[graft.ScaleStress]]: task-metrics
  * listeners are delivered on an async bus, so a snapshot taken right
  * after an action can miss the tail of its own tasks.
  * `SparkContext.listenerBus` is `private[spark]`; this one-method
  * accessor (the standard test-harness idiom — Spark's own suites
  * call the same method) lets the stage pass drain the bus before
  * reading its counters. Never used by library code paths. */
object GraftSparkInternals {
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
