package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}

/** Per-query resource accounting for the bench: a [[SparkListener]] that
  * aggregates task-level metrics between [[snapshotAndReset]] calls, so
  * each benched query gets a receipt of WHERE its bytes went — not just
  * how long it took.
  *
  * Why this exists: wall-clock on one 32-thread JVM says little about
  * 100 TB behavior, but shuffle bytes DO transfer — a query that
  * shuffles 5× its input at sf0.1 shuffles 5× its input at sf1000 too,
  * and that ratio (not the seconds) is what decides whether the plan
  * survives a 1000-executor cluster. The bench emits these per query
  * (`target/bench-metrics-<sf>.json`) so regressions in shuffle VOLUME
  * are caught even when wall-clock noise (2↔27 s on this VM) hides them.
  *
  * Fields per snapshot:
  *  - `shuffle_read` / `shuffle_write`: total bytes through the shuffle
  *    (read = local + remote; on a real cluster the remote share is
  *    network traffic).
  *  - `input`: bytes read from sources (parquet scans — reflects how
  *    well pruning/pushdown bounded the scan).
  *  - `spill_mem` / `spill_disk`: bytes spilled; nonzero disk spill at
  *    sf0.1 on a 128 GiB heap would flag a per-partition blowup.
  *  - `peak_exec_mem`: max single-task peak unsafe-memory reservation —
  *    the number that must fit in an EXECUTOR at scale.
  *  - `tasks`, `jobs`: volume of scheduling; `jobs` > a few for one
  *    query flags a driver-side loop (each iteration = one action).
  *
  * Listener events post asynchronously; callers must drain the bus
  * ([[MetricsListener.drain]] → `LiveListenerBus.waitUntilEmpty`)
  * before each snapshot — a fixed settle pause only makes the
  * misattribution race rarer, a drain removes it.
  */
class MetricsListener extends SparkListener {
  private val shuffleRead = new AtomicLong
  private val shuffleWrite = new AtomicLong
  private val input = new AtomicLong
  private val spillMem = new AtomicLong
  private val spillDisk = new AtomicLong
  private val peakExecMem = new AtomicLong
  private val tasks = new AtomicLong
  private val jobs = new AtomicLong

  override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
    val m = te.taskMetrics
    if (m != null) {
      shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      input.addAndGet(m.inputMetrics.bytesRead)
      spillMem.addAndGet(m.memoryBytesSpilled)
      spillDisk.addAndGet(m.diskBytesSpilled)
      peakExecMem.accumulateAndGet(m.peakExecutionMemory, Math.max(_, _))
      tasks.incrementAndGet()
    }
  }

  override def onJobStart(js: SparkListenerJobStart): Unit = {
    jobs.incrementAndGet()
  }

  /** Read all counters and zero them for the next query. Call
    * [[MetricsListener.drain]] first so in-flight events land in the
    * snapshot they belong to.
    */
  def snapshotAndReset(): Map[String, Long] = Map(
    "shuffle_read" -> shuffleRead.getAndSet(0),
    "shuffle_write" -> shuffleWrite.getAndSet(0),
    "input" -> input.getAndSet(0),
    "spill_mem" -> spillMem.getAndSet(0),
    "spill_disk" -> spillDisk.getAndSet(0),
    "peak_exec_mem" -> peakExecMem.getAndSet(0),
    "tasks" -> tasks.getAndSet(0),
    "jobs" -> jobs.getAndSet(0))
}

object MetricsListener {
  /** Flush the async listener bus so every already-posted event has
    * been delivered before a snapshot boundary.
    */
  def drain(sc: org.apache.spark.SparkContext): Unit =
    org.apache.spark.GraftSparkInternals.drainListenerBus(sc)
}
