package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The ×50 MAINTAINED tri-gate stream receipt (round-16 verdict #5's
  * second half): drive the production sink shape — stageCounts off,
  * folded publishes, NO inline compaction — over batches drawn from
  * the ×50 replica corpus, with `TrainingPipeline.maintainTriGate` as
  * the out-of-band cron every `maintainEvery` batches, and record per
  * batch: the three stores' live sentinel-dir counts and the batch
  * seconds. The claims under receipt:
  *   - live dirs stay bounded (≈ maintainEvery + fanout·levels) while
  *     an unmaintained writer would hold exactly i+1 dirs at batch i
  *     (one dir per batch, by construction — no control stream needed);
  *   - per-batch wall time stays FLAT as the store accumulates 50×-
  *     corpus batches, because the probes scan bounded live dirs.
  *
  * Expects the ×50 replica at `<root>/x50` (ScaleSuiteProbe's layout —
  * run it first; this probe reuses its materialization).
  *
  * Usage: tools/run.sh graft.TriGateMaintain50Probe [n] [perBatch] [maintainEvery] [scaleRoot]
  */
object TriGateMaintain50Probe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 64
    val perBatch = if (args.length > 1) args(1).toInt else 1500
    val maintainEvery = if (args.length > 2) args(2).toInt else 8
    val scaleRoot = if (args.length > 3) args(3) else "/tmp/graft-scale50"
    val src = s"$scaleRoot/x50"
    val spark = SparkSession.builder().master("local[32]")
      .appName("trigate-maintain50-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.Multimodal
    import graft.streaming.{GateStore, StreamCuration}

    // aligned batches off the ×50 corpus (TriGateScaleProbe's shape):
    // text for every doc, embeddings where vec_id aligns, synthesized
    // media payloads — staged once so construction stays untimed
    val docs = Tables.documents(spark, src)
      .select(col("doc_id"), col("text"), col("source"), col("n_chars"))
      .limit(n * perBatch)
    val embs = Tables.embeddings(spark, src)
      .select(col("vec_id"), col("embedding"))
    val aligned = Multimodal.mediaTableOf(docs)
      .select(col("media_id").as("doc_id"), col("payload"),
        col("meta.format").as("format"))
      .join(docs.select(col("doc_id"), col("text"), col("source")), Seq("doc_id"))
      .join(embs.withColumnRenamed("vec_id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("text"), col("source"), col("embedding"),
        col("payload"), col("format"))
      .withColumn("b", pmod(xxhash64(col("doc_id")), lit(n.toLong)).cast("int"))
    val stage = s"$scaleRoot/maintain50-batches"
    aligned.repartition(col("b")).write.mode("overwrite")
      .partitionBy("b").parquet(stage)
    val batches: Int => DataFrame = i =>
      spark.read.parquet(stage).filter(col("b") === i)
        .select("doc_id", "text", "source", "embedding", "payload", "format")

    val root = s"$scaleRoot/maintain50-stores"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val owner = "maintain50"
    val sink = StreamCuration.triGateSink(spark, s"$root/text",
      s"$root/embed", s"$root/media", src, s"$root/out", owner = owner,
      stageCounts = false, foldWrites = true)
    val policy = GateStore.MaintenancePolicy(
      compactEvery = maintainEvery, fanout = 4)

    def liveDirs(store: String, table: String): Int =
      GateStore.listBatchDirs(new java.io.File(s"$store/$table")).size

    val times = Array.ofDim[Double](n)
    val textDirs = Array.ofDim[Int](n)
    val embedDirs = Array.ofDim[Int](n)
    val mediaDirs = Array.ofDim[Int](n)
    var maintSec = 0.0
    var maintPasses = 0
    for (i <- 0 until n) {
      val b = batches(i)
      val t0 = System.nanoTime()
      sink(b, i.toLong)
      times(i) = (System.nanoTime() - t0) / 1e9
      if ((i + 1) % maintainEvery == 0) {
        val m0 = System.nanoTime()
        TrainingPipeline.maintainTriGate(spark, s"$root/text",
          s"$root/embed", s"$root/media", owner, policy)
        maintSec += (System.nanoTime() - m0) / 1e9
        maintPasses += 1
      }
      textDirs(i) = liveDirs(s"$root/text", "bands")
      embedDirs(i) = liveDirs(s"$root/embed", "sigs")
      mediaDirs(i) = liveDirs(s"$root/media", "bands")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      if (i % 8 == 7) { System.gc(); Thread.sleep(300); System.gc() }
    }
    val win = 16
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    def curve(ts: Seq[Double]) = ts.grouped(win).map(w => median(w))
      .map(v => math.rint(v * 1000) / 1000).mkString("[", ",", "]")
    def dirCurve(ds: Array[Int]) =
      ds.grouped(win).map(_.max).mkString("[", ",", "]")
    println(s"""{"metric":"trigate_maintain50","n_batches":$n,"docs_per_batch":$perBatch,"maintain_every":$maintainEvery,"src":"$src","batch_sec_curve":${curve(times.toSeq)},"total_sec":${math.rint(times.sum * 10) / 10},"maintain_passes":$maintPasses,"maintain_total_sec":${math.rint(maintSec * 10) / 10},"text_dirs_max_per_window":${dirCurve(textDirs)},"embed_dirs_max_per_window":${dirCurve(embedDirs)},"media_dirs_max_per_window":${dirCurve(mediaDirs)},"final_dirs":{"text":${textDirs(n - 1)},"embed":${embedDirs(n - 1)},"media":${mediaDirs(n - 1)}},"unmaintained_dirs_would_be":$n}""")
    spark.stop()
  }
}
