package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The tri-gate FLOOR receipt (round-14 verdict #7): the ~8 s/batch
  * flat line TriGateScaleProbe measured is ~30 Spark jobs of fixed
  * overhead — 8 of them the per-stage eager count()s plus the chunk
  * re-read and the stage_counts write. This probe drives the tri-gate
  * sink over N aligned micro-batches with stage counts ON and OFF,
  * counting jobs via a listener and recording per-window median batch
  * seconds, to receipt that the opt-out measurably lowers the flat
  * line while verdicts stay byte-identical (the spec pins equality;
  * this pins the saving).
  *
  * Usage: tools/run.sh graft.TriGateFloorProbe [N] [docsPerBatch] [legOrder] [src]
  * — arg 4 points at an alternative fixture dir (e.g. the Gate50Probe
  * ×50 replica) for the PAYLOAD-VOLUME legs: at 500 docs/batch the
  * three concurrent store appends each carry real megabytes, so the
  * fold's overlap claim is measured against actual I/O instead of
  * fixed job floor only.
  */
object TriGateFloorProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 48
    val perBatch = if (args.length > 1) args(1).toInt else 8
    val src = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .appName("tri-gate-floor-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.Multimodal
    import graft.streaming.StreamCuration

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
      .withColumn("b", (col("doc_id") % n).cast("int"))
    val stage = "/tmp/trigate-floor-batches"
    aligned.repartition(col("b")).write.mode("overwrite")
      .partitionBy("b").parquet(stage)
    val batches: Int => DataFrame = i =>
      spark.read.parquet(stage).filter(col("b") === i)
        .select("doc_id", "text", "source", "embedding", "payload", "format")

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }

    def run(stageCounts: Boolean, foldWrites: Boolean = false): (Seq[Double], Int) = {
      val tag = (if (stageCounts) "on" else "off") +
        (if (foldWrites) "-fold" else "")
      val root = s"/tmp/trigate-floor-$tag"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      // leveled compact-every-16 keeps both lines FLAT (the production
      // profile): without it, store-dir growth dominates later windows
      // and drowns the fixed-floor delta under measurement
      val sink = StreamCuration.triGateSink(spark,
        s"$root/text", s"$root/embed", s"$root/media", src, s"$root/out",
        owner = s"floor-probe-$tag", stageCounts = stageCounts,
        compactEvery = Some(16), compactLeveled = true,
        foldWrites = foldWrites)
      val times = Array.ofDim[Double](n)
      spark.sparkContext.addSparkListener(listener)
      jobs.set(0)
      try
        for (i <- 0 until n) {
          val b = batches(i)
          val t0 = System.nanoTime()
          sink(b, i.toLong)
          times(i) = (System.nanoTime() - t0) / 1e9
        }
      finally {
        Thread.sleep(1000)
        spark.sparkContext.removeSparkListener(listener)
      }
      (times.toSeq, jobs.get())
    }

    // optional 3rd arg = comma-separated leg order (within-JVM drift
    // inflates LATER legs — reversed-order runs adjudicate whether a
    // leg-vs-leg gap is real, the GateLeveledProbe control pattern)
    val legs = (if (args.length > 2) args(2) else "on,off,fold").split(",").toSeq
    val res = legs.map {
      case "on" => "on" -> run(stageCounts = true)
      case "off" => "off" -> run(stageCounts = false)
      case "fold" => "fold" -> run(stageCounts = false, foldWrites = true)
      case other => sys.error(s"unknown leg '$other'")
    }.toMap
    val win = 16
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    def curve(ts: Seq[Double]) = ts.grouped(win).map(w => median(w))
      .map(v => math.rint(v * 1000) / 1000).mkString("[", ",", "]")
    // per-leg keys only for legs that RAN — an omitted leg must be
    // absent from the artifact, not a zero-filled lookalike of a
    // measured run (historical key names kept: on/off = counts_*)
    val keyOf = Map("on" -> "counts_on", "off" -> "counts_off", "fold" -> "fold")
    val legJson = legs.map { name =>
      val (ts, js) = res(name)
      val k = keyOf(name)
      s""""${k}_curve":${curve(ts)},"${k}_total_sec":${math.rint(ts.sum * 10) / 10},"${k}_jobs":$js,"jobs_per_batch_${name}":${math.rint(10.0 * js / n) / 10}"""
    }.mkString(",")
    println(s"""{"metric":"trigate_floor","n_batches":$n,"docs_per_batch":$perBatch,"window":$win,"legs":"${legs.mkString(",")}",$legJson}""")
    spark.stop()
  }
}
