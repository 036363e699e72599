package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Race-safe parquet artifact publication for the fingerprint-keyed
  * derived tables (m2 per-doc inference, m3 topic keywords, t23 d7
  * cluster labels). The artifacts are deterministic functions of their
  * key — (corpus dir, data fingerprint, params) — so ANY writer's
  * output is interchangeable; the only hazard is two concurrent first
  * runs interleaving a `mode("overwrite")` into the same directory
  * (one job's _SUCCESS over the other's part files). Publishing via a
  * unique temp dir + filesystem rename closes it: exactly one rename
  * wins, losers delete their temp and read the winner's identical
  * output.
  */
object Artifacts {

  /** If `path` is absent, write `df` to a sibling temp dir and rename
    * it into place (atomic on a real DFS; on local FS the rename is a
    * directory move — still a single syscall, never an interleaved
    * overwrite). Returns a fresh read of the published artifact.
    */
  def publishParquet(df: DataFrame, path: String): DataFrame = {
    val s = df.sparkSession
    val dest = new Path(path)
    val fs = dest.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(dest)) {
      val tmp = new Path(path + ".tmp-" + java.util.UUID.randomUUID)
      df.write.mode("overwrite").parquet(tmp.toString)
      fs.mkdirs(dest.getParent)
      // rename fails iff dest already exists — a concurrent writer won;
      // its artifact is identical by construction, so just drop ours
      if (!fs.rename(tmp, dest)) fs.delete(tmp, true)
    }
    s.read.parquet(path)
  }
}
