package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The COMPOSITION-level gate receipt: one stream, three gates, many
  * micro-batches. GateCompactionProbe isolates store-dir growth on the
  * cheapest single gate; this probe drives the full tri-gate curation
  * sink (`StreamCuration.triGateSink` → curateIncrementalBatch: quality
  * gate, exact dedup, text MinHash gate, embedding sign-LSH gate, media
  * pHash gate, decontamination, chunking, three store appends) for N
  * aligned micro-batches, with and without the inline
  * compact-every-K policy, recording per-window median batch seconds.
  * The policy run's batch times INCLUDE its inline compactions — the
  * honest production profile, not a separated maintenance ledger.
  *
  * Output: one JSON line with both curves, final live-dir counts per
  * store, and totals.
  *
  * Usage: tools/run.sh graft.TriGateScaleProbe [N] [K] [docsPerBatch]
  */
object TriGateScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 256
    val k = if (args.length > 1) args(1).toInt else 64
    val perBatch = if (args.length > 2) args(2).toInt else 8
    val src = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .appName("tri-gate-scale-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.Multimodal
    import graft.streaming.StreamCuration

    // N disjoint aligned-modality batches: every doc carries text, docs
    // with a matching vec_id carry the embedding, and every doc carries
    // a synthesized media payload (mediaTableOf — the same mapping the
    // production gate sees). Materialized once up front so batch
    // construction stays out of the timings.
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
    val stage = "/tmp/trigate-scale-batches"
    aligned.repartition(col("b")).write.mode("overwrite")
      .partitionBy("b").parquet(stage)
    val batches: Int => DataFrame = i =>
      spark.read.parquet(stage).filter(col("b") === i)
        .select("doc_id", "text", "source", "embedding", "payload", "format")

    def run(compactEvery: Option[Int]): (Seq[Double], Seq[Int]) = {
      val tag = compactEvery.fold("none")(_.toString)
      val root = s"/tmp/trigate-scale-$tag"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      val sink = StreamCuration.triGateSink(spark,
        s"$root/text", s"$root/embed", s"$root/media", src, s"$root/out",
        owner = s"trigate-probe-$tag", compactEvery = compactEvery)
      val times = Array.ofDim[Double](n)
      for (i <- 0 until n) {
        val b = batches(i)
        val t0 = System.nanoTime()
        sink(b, i.toLong)
        times(i) = (System.nanoTime() - t0) / 1e9
      }
      def liveDirs(p: String) = Option(new java.io.File(p).listFiles())
        .map(_.count(_.getName.startsWith("batch="))).getOrElse(0)
      val dirs = Seq(s"$root/text/bands", s"$root/embed/sigs",
        s"$root/media/bands").map(liveDirs)
      val win = 32
      def median(xs: Seq[Double]): Double = {
        val s = xs.sorted
        if (s.length % 2 == 1) s(s.length / 2)
        else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
      }
      val curve = times.grouped(win).map(w => median(w.toSeq)).toSeq
        .map(v => math.rint(v * 1000) / 1000)
      (curve, dirs)
    }

    val (flatCurve, flatDirs) = run(None)
    val (compCurve, compDirs) = run(Some(k))
    def arr[T](xs: Seq[T]) = xs.mkString("[", ",", "]")
    println(s"""{"metric":"trigate_scale","n_batches":$n,"compact_every":$k,"docs_per_batch":$perBatch,"window":32,"no_compaction_curve":${arr(flatCurve)},"compacted_curve":${arr(compCurve)},"final_dirs_nocompact":${arr(flatDirs)},"final_dirs_compacted":${arr(compDirs)}}""")
    spark.stop()
  }
}
