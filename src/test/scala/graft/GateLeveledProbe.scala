package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The write-amplification receipt for leveled vs full-rewrite gate
  * compaction (round-14 verdict #1): drive the media gate for N tiny
  * micro-batches under compact-every-K with BOTH policies and record,
  * for EVERY compaction, the bytes it rewrote (= the store bytes of the
  * dirs it merged away) and its wall seconds.
  *
  * The full policy re-merges the previous compaction's output every
  * time, so its per-compaction bytes grow linearly with the stream
  * (cumulative O(N²/every)); the leveled policy folds only the `every`
  * fresh dirs (level-0, O(every) per compaction, the common case) plus
  * rare fanout-triggered cascades — cumulative O(N·log N). Probe times
  * per window are recorded too: leveled keeps the live-dir count
  * bounded at (every−1)+fanout·levels, so the probe curve must stay as
  * flat as the full policy's.
  *
  * Output: one JSON line with per-compaction (batch, bytes, sec) series
  * for both policies, cumulative rewritten bytes, and per-window median
  * batch seconds.
  *
  * Usage: tools/run.sh graft.GateLeveledProbe [N] [K] [fanout] [docsPerBatch] [order]
  * `order` = full-first (default) | leveled-first — the two policies run
  * sequentially in ONE JVM, so whichever runs second inherits ~N batches
  * of JVM aging; flipping the order separates that shared-process drift
  * from any real policy cost in the probe-time curves.
  */
object GateLeveledProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 512
    val k = if (args.length > 1) args(1).toInt else 32
    val fanout = if (args.length > 2) args(2).toInt else 4
    val perBatch = if (args.length > 3) args(3).toInt else 8
    val leveledFirst = args.length > 4 && args(4) == "leveled-first"
    val src = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .appName("gate-leveled-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.Multimodal
    import graft.streaming.{GateStore, StreamMediaDedup}

    val media = Multimodal.mediaTableOf(
        Tables.documents(spark, src).limit(n * perBatch))
      .select(col("media_id"), col("payload"), col("meta.format").as("format"))
      .withColumn("b", (col("media_id") % n).cast("int"))
    val stage = "/tmp/gate-leveled-batches"
    media.repartition(col("b")).write.mode("overwrite")
      .partitionBy("b").parquet(stage)
    val batches: Int => DataFrame = i =>
      spark.read.parquet(stage).filter(col("b") === i)
        .select("media_id", "payload", "format")

    def liveDirBytes(store: String): Map[Long, Long] =
      GateStore.listBatchDirs(new java.io.File(s"$store/bands"))
        .map { case (id, p) =>
          id -> GateStore.treeBytes(new java.io.File(p)) }.toMap

    // (policyTag, perCompaction (batch, bytesMerged, sec), batchTimes, finalDirs)
    def run(leveled: Boolean): (Seq[(Int, Long, Double)], Seq[Double], Int) = {
      val tag = if (leveled) "leveled" else "full"
      val store = s"/tmp/gate-leveled-store-$tag"
      val out = s"/tmp/gate-leveled-out-$tag"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(store))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
      val times = Array.ofDim[Double](n)
      val comps = Seq.newBuilder[(Int, Long, Double)]
      for (i <- 0 until n) {
        val b = batches(i)
        val t0 = System.nanoTime()
        StreamMediaDedup.processBatch(spark, b, i.toLong, store, out)
        times(i) = (System.nanoTime() - t0) / 1e9
        // maintenance, measured separately: bytes merged = store bytes
        // of the dirs the compaction deleted (the exact rewrite volume)
        val before = liveDirBytes(store)
        val c0 = System.nanoTime()
        val fired =
          if (leveled)
            StreamMediaDedup.maybeCompactLeveled(spark, store, k, fanout).nonEmpty
          else StreamMediaDedup.maybeCompact(spark, store, k).nonEmpty
        val dt = (System.nanoTime() - c0) / 1e9
        if (fired) {
          val after = liveDirBytes(store).keySet
          val merged = before.filter { case (id, _) => !after.contains(id) }
            .values.sum
          comps += ((i, merged, math.rint(dt * 1000) / 1000))
        }
      }
      val dirs = GateStore.listBatchDirs(new java.io.File(s"$store/bands")).size
      (comps.result(), times.toSeq, dirs)
    }

    val (fullRes, levRes) =
      if (leveledFirst) {
        val lev = run(leveled = true); (run(leveled = false), lev)
      } else {
        val full = run(leveled = false); (full, run(leveled = true))
      }
    val (fullComps, fullTimes, fullDirs) = fullRes
    val (levComps, levTimes, levDirs) = levRes

    val win = 64
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    def curve(ts: Seq[Double]) = ts.grouped(win).map(w => median(w))
      .map(v => math.rint(v * 1000) / 1000).mkString("[", ",", "]")
    def compJson(cs: Seq[(Int, Long, Double)]) = cs
      .map { case (b, by, s) => s"""{"batch":$b,"bytes":$by,"sec":$s}""" }
      .mkString("[", ",", "]")
    val fullCum = fullComps.map(_._2).sum
    val levCum = levComps.map(_._2).sum
    val order = if (leveledFirst) "leveled-first" else "full-first"
    println(s"""{"metric":"gate_leveled","n_batches":$n,"every":$k,"fanout":$fanout,"docs_per_batch":$perBatch,"order":"$order","window":$win,"full_compactions":${compJson(fullComps)},"leveled_compactions":${compJson(levComps)},"full_rewritten_bytes":$fullCum,"leveled_rewritten_bytes":$levCum,"full_probe_curve":${curve(fullTimes)},"leveled_probe_curve":${curve(levTimes)},"final_dirs_full":$fullDirs,"final_dirs_leveled":$levDirs}""")
    spark.stop()
  }
}
