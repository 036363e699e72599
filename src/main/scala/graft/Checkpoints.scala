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

  def eager(df: DataFrame): Checkpointed = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val mat = df.localCheckpoint(eager = true)
    val pinned = sc.getPersistentRDDs
      .collect { case (id, r) if !before.contains(id) => r }.toSeq
    Checkpointed(mat, pinned)
  }
}
