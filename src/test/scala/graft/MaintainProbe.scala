package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Receipt for GateStore.maintain (round-15 verdict #3): a gate driven
  * with NO inline compaction, maintained out-of-band every
  * `maintainEvery` batches by the policy-driven entry point, vs an
  * unmaintained control. Records the live-dir count and store bytes
  * after each batch for both stores, plus when maintenance compacted —
  * the receipt that a scheduler calling maintain() bounds store growth
  * for a writer that never compacts inline, with verdicts equal
  * (spec-pinned; re-checked here per batch).
  *
  * Usage: tools/run.sh graft.MaintainProbe [nBatches] [maintainEvery]
  */
object MaintainProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 64
    val maintainEvery = if (args.length > 1) args(1).toInt else 8
    val src = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .appName("maintain-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.Multimodal
    import graft.streaming.{GateStore, StreamMediaDedup}

    val media = Multimodal.mediaTable(spark, src)
      .select(col("media_id"), col("payload"), col("meta.format").as("format"))
    val batch: Int => DataFrame = i => media.filter(col("media_id") % n === i)

    val root = "/tmp/graft-maintain-probe"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val (cs, co) = (s"$root/cstore", s"$root/cout") // unmaintained control
    val (ms, mo) = (s"$root/mstore", s"$root/mout") // maintained
    val policy = GateStore.MaintenancePolicy(
      compactEvery = maintainEvery, fanout = 4)

    def canon(p: String): Set[(Long, Long, Long)] =
      spark.read.parquet(p).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val ctrlDirs = Array.ofDim[Int](n); val ctrlBytes = Array.ofDim[Long](n)
    val maintDirs = Array.ofDim[Int](n); val maintBytes = Array.ofDim[Long](n)
    val compactedAt = Seq.newBuilder[Int]
    var maintSec = 0.0
    for (i <- 0 until n) {
      val b = batch(i)
      StreamMediaDedup.processBatch(spark, b, i.toLong, cs, co)
      StreamMediaDedup.processBatch(spark, b, i.toLong, ms, mo)
      if ((i + 1) % maintainEvery == 0) { // the out-of-band cron tick
        val t0 = System.nanoTime()
        val rep = StreamMediaDedup.maintain(spark, ms, policy)
        maintSec += (System.nanoTime() - t0) / 1e9
        if (rep.compactions.nonEmpty) compactedAt += i
      }
      val cStats = StreamMediaDedup.describe(cs)
      val mStats = StreamMediaDedup.describe(ms)
      ctrlDirs(i) = cStats.tables.head.liveDirs
      ctrlBytes(i) = cStats.totalBytes
      maintDirs(i) = mStats.tables.head.liveDirs
      maintBytes(i) = mStats.totalBytes
      assert(canon(s"$mo/batch=$i") == canon(s"$co/batch=$i"),
        s"maintenance changed verdicts at batch $i")
    }
    def arr[T](xs: Array[T]) = xs.mkString("[", ",", "]")
    println(s"""{"metric":"maintain_probe","n_batches":$n,"maintain_every":$maintainEvery,"compacted_at":${compactedAt.result().mkString("[", ",", "]")},"maintain_total_sec":${math.rint(maintSec * 100) / 100},"ctrl_dirs_final":${ctrlDirs(n - 1)},"maint_dirs_final":${maintDirs(n - 1)},"ctrl_bytes_final":${ctrlBytes(n - 1)},"maint_bytes_final":${maintBytes(n - 1)},"ctrl_dirs":${arr(ctrlDirs)},"maint_dirs":${arr(maintDirs)}}""")
    spark.stop()
  }
}
