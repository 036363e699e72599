package graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame

/** Tracked local checkpoints. `Dataset.localCheckpoint` pins RDD blocks
  * in executor storage that `Dataset.unpersist` NEVER releases — dataset
  * unpersist only talks to the cache manager, and the checkpoint RDD is
  * not a cache-manager entry. An iterative job that checkpoints per
  * round therefore grows storage monotonically unless it releases the
  * superseded rounds' blocks at the RDD level (round 3's bench showed
  * 13–40× timing inflation from exactly this).
  *
  * `eager` snapshots `sparkContext.getPersistentRDDs` around the
  * checkpoint, so the returned handle knows precisely which RDDs the
  * materialization pinned (public API only — no reach into LogicalRDD).
  * Any cache that happened to materialize inside the same action is
  * captured too; releasing it alongside the checkpoint is safe because
  * the checkpoint result no longer depends on anything upstream.
  */
object Checkpoints {

  final case class Checkpointed(df: DataFrame, pinned: Seq[RDD[_]]) {
    def release(): Unit = pinned.foreach(_.unpersist(blocking = false))
  }

  def eager(df: DataFrame): Checkpointed = eagerBuild(df.sparkSession)(df)

  /** Like [[eager]], but the before-snapshot is taken BEFORE `build` is
    * evaluated. This matters when constructing the frame itself runs
    * driver-side actions that pin caches — the stored dedup probes
    * ([[graft.queries.Dedup.d19ProbeDirs]] et al.) collect their
    * candidate-bucket list while BUILDING the result plan, which
    * materializes their internal batch/candidate caches; `eager(probe)`
    * would snapshot after those blocks are already pinned and the
    * handle would never release them (a per-micro-batch leak in a
    * long-running streaming gate). With the thunk form the snapshot
    * brackets construction + checkpoint, so release() frees the probe's
    * internals too.
    */
  def eagerBuild(spark: org.apache.spark.sql.SparkSession)(
      build: => DataFrame): Checkpointed = {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    def delta() = sc.getPersistentRDDs
      .collect { case (id, r) if !before.contains(id) => r }.toSeq
    // exception safety: if the builder or the checkpoint throws, the
    // caches pinned so far have no handle — release them before
    // rethrowing, or a failed-and-retried micro-batch leaks per attempt
    val mat =
      try build.localCheckpoint(eager = true)
      catch { case t: Throwable =>
        delta().foreach(_.unpersist(blocking = false)); throw t
      }
    Checkpointed(mat, delta())
  }

  /** Run `work` and unpersist every RDD it left pinned. For WRITE legs
    * whose building blocks cache internally (e.g. the MinHash banding's
    * signature cache) and whose result is fully on disk when `work`
    * returns — nothing in memory is needed afterwards, so everything
    * the leg pinned is released. Not safe under concurrent Spark
    * activity on the same session (another thread's fresh caches would
    * be swept too); the streaming gates run one micro-batch at a time,
    * which is exactly the single-threaded shape this assumes.
    */
  def sweep[T](spark: org.apache.spark.sql.SparkSession)(work: => T): T = {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    // finally: a throwing write leg must still release what it pinned
    // (a retried micro-batch would otherwise leak one cache per attempt)
    try work
    finally sc.getPersistentRDDs
      .collect { case (id, r) if !before.contains(id) => r }
      .foreach(_.unpersist(blocking = false))
  }
}
