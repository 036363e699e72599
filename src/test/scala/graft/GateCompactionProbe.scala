package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WHEN to compact a long-running gate store — the scheduling receipt:
  * drive the media gate (the cheapest of the triad per batch, so the
  * store-management overhead dominates soonest) for N tiny micro-
  * batches against two stores, one never compacted and one compacted
  * every K batches, recording per-window median batch times. The
  * uncompacted store accumulates one `batch=<id>` dir per batch, so
  * every probe pays (a) the directory listing, (b) an N-way parquet
  * read union whose ANALYSIS cost grows with N, and (c) N file
  * footers; the compacted store holds those at ≤ K.
  *
  * Output: one JSON line with per-window (64 batches) median batch
  * seconds for both configs, the compaction count and total compaction
  * seconds (the amortized maintenance cost), and final dir counts.
  *
  * Usage: tools/run.sh graft.GateCompactionProbe [N] [K] [docsPerBatch]
  */
object GateCompactionProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 1024
    val k = if (args.length > 1) args(1).toInt else 64
    val perBatch = if (args.length > 2) args(2).toInt else 8
    val src = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .appName("gate-compaction-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.Multimodal
    import graft.streaming.StreamMediaDedup

    // N disjoint tiny batches of synthesized media rows, materialized
    // once up front so batch construction cost stays out of the timings
    val media = Multimodal.mediaTableOf(
        Tables.documents(spark, src).limit(n * perBatch))
      .select(col("media_id"), col("payload"), col("meta.format").as("format"))
      .withColumn("b", (col("media_id") % n).cast("int"))
    val stage = "/tmp/gate-compaction-batches"
    media.repartition(col("b")).write.mode("overwrite")
      .partitionBy("b").parquet(stage)
    val batches: Int => DataFrame = i =>
      spark.read.parquet(stage).filter(col("b") === i)
        .select("media_id", "payload", "format")

    def run(compactEvery: Option[Int]): (Seq[Double], Int, Double, Int) = {
      val tag = compactEvery.fold("none")(_.toString)
      val store = s"/tmp/gate-compaction-store-$tag"
      val out = s"/tmp/gate-compaction-out-$tag"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(store))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
      val times = Array.ofDim[Double](n)
      var compactions = 0
      var compactSec = 0.0
      for (i <- 0 until n) {
        val b = batches(i)
        val t0 = System.nanoTime()
        StreamMediaDedup.processBatch(spark, b, i.toLong, store, out)
        times(i) = (System.nanoTime() - t0) / 1e9
        compactEvery.foreach { every =>
          if (i > 0 && i % every == 0) {
            val c0 = System.nanoTime()
            StreamMediaDedup.compact(spark, store, i.toLong)
            compactSec += (System.nanoTime() - c0) / 1e9
            compactions += 1
          }
        }
      }
      val dirs = Option(new java.io.File(s"$store/bands").listFiles())
        .map(_.count(_.getName.startsWith("batch="))).getOrElse(0)
      // per-window medians (64-batch windows): robust against this
      // VM's single-batch jitter
      val win = 64
      def median(xs: Seq[Double]): Double = {
        val s = xs.sorted
        if (s.length % 2 == 1) s(s.length / 2)
        else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
      }
      val curve = times.grouped(win).map(w => median(w.toSeq)).toSeq
        .map(v => math.rint(v * 1000) / 1000)
      (curve, compactions, math.rint(compactSec * 1000) / 1000, dirs)
    }

    val (flatCurve, _, _, flatDirs) = run(None)
    val (compCurve, nComp, compSec, compDirs) = run(Some(k))
    def arr(xs: Seq[Double]) = xs.mkString("[", ",", "]")
    println(s"""{"metric":"gate_compaction","n_batches":$n,"compact_every":$k,"docs_per_batch":$perBatch,"window":64,"no_compaction_curve":${arr(flatCurve)},"compacted_curve":${arr(compCurve)},"compactions":$nComp,"compaction_total_sec":$compSec,"final_dirs_nocompact":$flatDirs,"final_dirs_compacted":$compDirs}""")
    spark.stop()
  }
}
