package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ×50 receipt for the incremental-gate TRIAD (round-16 verdict #5,
  * first half): store build and fixed-batch stored-probe times for the
  * text (d19), embedding (d20/SigWide) and media (mm9) gates at ×1 and
  * ×50, plus the inline SparkEntry queries where they are scale-sane.
  *
  * REPLICA DESIGN — content-distinct, unlike ScaleSuiteProbe's
  * worst-case near-dup replicas: replica i>0 prefixes every token
  * after the first with `r<i>` (one regexp pass; intra-replica
  * near-dup structure preserved exactly, cross-replica Jaccard ≈ 0)
  * and draws hash-random embeddings (cross-replica cosine ≈ 0). A
  * near-dup replica corpus at ×50 is NOT a bigger corpus — it is a
  * corpus that is 98% duplicates, whose TRUE pair count (and therefore
  * any dedup gate's output and verify shuffle) explodes ~50× per batch
  * doc by construction; measured: the d19 verify shuffle alone filled
  * the disk. Content-distinct replicas make the ×50 legs measure
  * corpus GROWTH, which is the claim under receipt.
  *
  * The inline d20 query is deliberately EXCLUDED at ×50: it probes at
  * the oracle-pinned SigNarrow geometry, whose 4-bit bands pass ~23%
  * of ALL cross pairs regardless of content (10k×225k pairs → ~5·10⁸
  * candidates → a ~100 GB vector-fetch shuffle). That saturation is
  * already receipted (SCALING.md round 14); the scale path is the
  * SigWide STORE, measured here.
  *
  * Usage: tools/run.sh graft.Gate50Probe [factor] [srcDir] [outRoot]
  */
object Gate50Probe {
  def main(args: Array[String]): Unit = {
    val factor = if (args.nonEmpty) args(0).toInt else 50
    val src = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val root = if (args.length > 2) args(2) else "/tmp/graft-scale50"
    val spark = SparkSession.builder().master("local[32]")
      .appName("gate50-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.{Dedup, Multimodal}

    def replicate(df: DataFrame, f: Int, key: String): DataFrame = {
      val off = df.agg(max(col(key))).first().getLong(0) + 1L
      df.select(col("*"), explode(sequence(lit(0L), lit(f - 1L))).as("rep"))
        .withColumn(key, col(key) + col("rep") * off)
    }
    def writeScaled(f: Int, outDir: String): Unit = {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
      replicate(Tables.documents(spark, src), f, "doc_id")
        .withColumn("text", when(col("rep") === 0, col("text"))
          .otherwise(regexp_replace(col("text"), lit("\\s+"),
            concat(lit(" r"), col("rep")))))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .drop("rep")
        .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
      replicate(Tables.embeddings(spark, src), f, "vec_id")
        .withColumn("embedding", when(col("rep") === 0, col("embedding"))
          .otherwise(expr("transform(sequence(0, 63), j -> " +
            "cast((pmod(xxhash64(vec_id, j), 2001) - 1000) / 1000.0 as float))")))
        .drop("rep")
        .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    }

    def cleanup(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc(); Thread.sleep(300); System.gc()
    }
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      val dt = (System.nanoTime() - t0) / 1e9
      cleanup(); dt
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    def r3(x: Double): Double = math.rint(x * 1000) / 1000

    val d1 = s"$root/x1"; val dF = s"$root/x$factor"
    val reuse = sys.env.get("SPARK_GRAFT_SCALE_REUSE").contains("1") &&
      java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$dF/documents.parquet"))
    if (!reuse) {
      System.err.println(s"[gate50] writing x1 -> $d1, x$factor -> $dF")
      writeScaled(1, d1); writeScaled(factor, dF)
    } else System.err.println(s"[gate50] reusing $d1 / $dF")
    cleanup()

    // FIXED probe batches (the ×1 fixture's %10==7 slices) — probe cost
    // should track the BATCH, not the corpus, so the batch is pinned
    // while the store grows 50×
    val batchDocs = Tables.documents(spark, d1).filter(col("doc_id") % 10 === 7)
      .select(col("doc_id"), col("text")).cache()
    val batchVecs = Tables.embeddings(spark, d1).filter(col("vec_id") % 10 === 7)
      .select(col("vec_id"), col("embedding")).cache()
    val batchMedia = Multimodal.mediaTableOf(
        Tables.documents(spark, d1).filter(col("doc_id") % 10 === 7))
      .select(col("media_id"), col("payload"), col("meta.format").as("format"))
      .cache()
    Seq(batchDocs, batchVecs, batchMedia).foreach(_.count())

    val parts = Seq.newBuilder[String]
    parts += s"\"factor\":$factor"
    parts += s"\"src\":\"$src\""
    parts += "\"replicas\":\"content-distinct (token-prefixed text, hash-random vectors)\""
    for ((dir, tag) <- Seq((d1, "x1"), (dF, s"x$factor"))) {
      val corpusDocs = Tables.documents(spark, dir)
        .filter(col("doc_id") % 10 =!= 7)
      val corpusVecs = Tables.embeddings(spark, dir)
        .filter(col("vec_id") % 10 =!= 7)
        .select(col("vec_id"), col("embedding"))
      val corpusMedia = Multimodal.mediaTableOf(corpusDocs)
        .select(col("media_id"), col("payload"),
          col("meta.format").as("format"))
      val stores = s"$root/stores-$tag"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stores))
      // store builds: the amortized once-cost, expected ~linear
      val bText = timed(Dedup.d19WriteStore(
        corpusDocs.select(col("doc_id"), col("text")), s"$stores/text"))
      val bEmbed = timed(Dedup.d20WriteStore(corpusVecs, s"$stores/embed",
        Dedup.SigWide))
      val bMedia = timed(Multimodal.mm9IndexRows(corpusMedia)
        .write.mode("overwrite").parquet(s"$stores/media/bands"))
      // stored probes: the per-batch hot path, expected ~flat (3-run)
      val pText = median((1 to 3).map(_ => timed(
        Dedup.d19ProbeStored(spark, batchDocs, s"$stores/text")
          .write.format("noop").mode("overwrite").save())))
      val pEmbed = median((1 to 3).map(_ => timed(
        Dedup.d20ProbeStored(spark, batchVecs, s"$stores/embed",
            Dedup.SigWide, probeDepth = 1)
          .write.format("noop").mode("overwrite").save())))
      val pMedia = median((1 to 3).map(_ => timed(
        Multimodal.mm9ProbeStored(spark, batchMedia, s"$stores/media",
            probeDepth = 1)
          .write.format("noop").mode("overwrite").save())))
      // inline oracle queries where scale-sane (d20's narrow inline is
      // excluded — see scaladoc); 1 warm + 2 timed
      def inline(q: String): Double = {
        timed(SparkEntry.queries(q)(spark, dir)
          .write.format("noop").mode("overwrite").save()) // warm
        median((1 to 2).map(_ => timed(SparkEntry.queries(q)(spark, dir)
          .write.format("noop").mode("overwrite").save())))
      }
      val iText = inline("d19_incremental_minhash")
      val iMedia = inline("mm9_incremental_phash")
      parts += s"""\"$tag\":{"build":{"text":${r3(bText)},"embed":${r3(bEmbed)},"media":${r3(bMedia)}},"probe_stored":{"text":${r3(pText)},"embed":${r3(pEmbed)},"media":${r3(pMedia)}},"inline":{"d19":${r3(iText)},"mm9":${r3(iMedia)}}}"""
    }
    println(s"""{"metric":"gate50",${parts.result().mkString(",")}}""")
    spark.stop()
  }
}
