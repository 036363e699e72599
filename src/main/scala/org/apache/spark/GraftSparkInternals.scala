package org.apache.spark

/** The one deliberate reach into `private[spark]` surface: the live
  * listener bus. Benchmark receipts attribute task metrics to the query
  * that just ran, but listener events post ASYNCHRONOUSLY — without a
  * drain, task-end events from a timed query can arrive after its
  * snapshot and be credited to the NEXT query, quietly corrupting the
  * per-query resource receipts (shuffle/input/spill volumes) that the
  * scale analysis treats as ground truth. A fixed sleep only makes the
  * race rarer; `waitUntilEmpty` removes it.
  */
object GraftSparkInternals {

  /** Block until every queued listener event has been delivered (or the
    * bus's internal timeout elapses — then proceed; a late event is the
    * pre-existing failure mode, not a new one).
    */
  def drainListenerBus(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty()
    catch { case _: java.util.concurrent.TimeoutException => () }
}
