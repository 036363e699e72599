package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** d20/mm9 incremental-vs-rebuild receipts — the d19 fixed-batch
  * protocol ([[D19IncrementalProbe]]) applied to the other two gate
  * modalities, so the "per-batch cost is flat in corpus size" claim is
  * MEASURED for all three:
  *
  *  - `store_build`    — d20WriteStore / mm9WriteStore over the ×F
  *    corpus (the once-cost, amortized across batches),
  *  - `probe_stored`   — the FIXED batch (`%10 = 7` of the ×1 fixture)
  *    probed against that store,
  *  - `rebuild_inline` — d20Frame / mm9Frame (re-sign/re-hash the whole
  *    corpus per batch — what a pipeline without the persisted index
  *    pays),
  *
  * at ×1 and ×F, 3-run medians. Replicas are PERTURBED NEAR-DUPS of
  * their source rows (small additive vector noise / a text suffix), so
  * the true candidate set grows ~×F with the corpus — worst case for
  * the verify leg, same as the d19 receipt.
  *
  * Usage: tools/run.sh graft.GateScaleProbe <embed|embedu|media> [xFdir] [F] [runs]
  *
  * `embed` replicates the corpus as NEAR-DUPS (output-quadratic: the
  * true answer grows ×F², worst case for the verify leg); `embedu`
  * replicates DECORRELATED (true answer fixed at ×1, worst case for
  * the candidate filter — the regime where signature geometry decides
  * whether the probe saturates).
  */
object GateScaleProbe {
  def main(args: Array[String]): Unit = {
    val modality = args(0)
    val f = if (args.length > 2) args(2).toInt else 10
    val xfDir =
      if (args.length > 1) args(1) else s"/tmp/graft-scale/${modality}x$f"
    val runs = if (args.length > 3) args(3).toInt else 3
    val src = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .appName(s"gate-scale-probe-$modality")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.{Dedup, Multimodal}

    // ×f replicas with near-dup perturbation (every replica stays a
    // true near-dup of its source — worst case for the verify leg)
    if (modality == "embed" &&
        !new java.io.File(s"$xfDir/embeddings.parquet").exists()) {
      val e = Tables.embeddings(spark, src)
      val off = e.agg(max(col("vec_id"))).first().getLong(0) + 1L
      e.select(col("*"), explode(sequence(lit(0L), lit(f - 1L))).as("rep"))
        .withColumn("vec_id", col("vec_id") + col("rep") * off)
        .withColumn("embedding", when(col("rep") === 0, col("embedding"))
          .otherwise(transform(col("embedding"), (x, i) =>
            x + lit(0.002f) *
              (pmod(col("rep") + i.cast("long"), lit(5L)).cast("float")
                - lit(2.0f)))))
        .drop("rep")
        .write.mode("overwrite").parquet(s"$xfDir/embeddings.parquet")
    }
    // ×f replicas DECORRELATED (deterministic per-(rep, dim) sign
    // flips: cos(any two replicas) ≈ 0) — the corpus-GROWTH fixture.
    // The near-dup fixture above is output-quadratic (the true answer
    // itself grows ×f², so no geometry can be flat); this one holds
    // the true pair set fixed at the ×1 answer while the corpus grows
    // ×f, which is exactly the regime the signature geometry governs:
    // uncorrelated pairs pass a band with prob s^bandBits at s ≈ 0.5,
    // so narrow 4-bit bands pass ~23% of all batch×corpus pairs
    // (saturation) while wide 8-bit bands pass ~3%.
    if (modality == "embedu" &&
        !new java.io.File(s"$xfDir/embeddings.parquet").exists()) {
      val e = Tables.embeddings(spark, src)
      val off = e.agg(max(col("vec_id"))).first().getLong(0) + 1L
      e.select(col("*"), explode(sequence(lit(0L), lit(f - 1L))).as("rep"))
        .withColumn("vec_id", col("vec_id") + col("rep") * off)
        .withColumn("embedding", when(col("rep") === 0, col("embedding"))
          .otherwise(transform(col("embedding"), (x, i) =>
            when(pmod(xxhash64(col("rep"), i.cast("long")), lit(2L)) === 0, x)
              .otherwise(-x))))
        .drop("rep")
        .write.mode("overwrite").parquet(s"$xfDir/embeddings.parquet")
    }
    if (modality == "media" &&
        !new java.io.File(s"$xfDir/documents.parquet").exists()) {
      val docs = Tables.documents(spark, src)
      val off = docs.agg(max(col("doc_id"))).first().getLong(0) + 1L
      docs.select(col("*"),
          explode(sequence(lit(0L), lit(f - 1L))).as("rep"))
        .withColumn("doc_id", col("doc_id") + col("rep") * off)
        .withColumn("text", when(col("rep") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" r"), col("rep"))))
        .drop("rep")
        .write.mode("overwrite").parquet(s"$xfDir/documents.parquet")
    }

    def cleanup(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc(); Thread.sleep(300); System.gc()
    }
    def timed(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn
      val dt = (System.nanoTime() - t0) / 1e9; cleanup(); dt
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // the production synthesis, flattened to the gate's input shape
    def mediaOf(docs: DataFrame): DataFrame =
      graft.queries.Multimodal.mediaTableOf(docs)
        .select(col("media_id"), col("payload"),
          col("meta.format").as("format"))

    val out = scala.collection.mutable.LinkedHashMap[String, Double]()
    for ((label, dir) <- Seq("x1" -> src, s"x$f" -> xfDir)) {
      val store = s"/tmp/$modality-probe-store-$label"
      if (modality.startsWith("embed")) {
        val batch = Tables.embeddings(spark, src)
          .filter(col("vec_id") % 10 === 7)
        def corpusOf(d: String) = spark.read.parquet(s"$d/embeddings.parquet")
          .filter(col("vec_id") % 10 =!= 7)
        out(s"store_build_$label") = median((1 to runs).map(_ =>
          timed(Dedup.d20WriteStore(corpusOf(dir), store))))
        out(s"probe_stored_$label") = median((1 to runs).map(_ =>
          timed(noop(Dedup.d20ProbeStored(spark, batch, store)))))
        // the production-width geometry (SigWide, 64-bit/4×16 bands):
        // same fixed batch against a wide-signature store — the
        // candidate-rate cut that keeps the stored probe ahead of the
        // rebuild past the narrow geometry's 64-cell saturation point
        val wStore = s"$store-wide"
        out(s"store_build_wide_$label") = median((1 to runs).map(_ =>
          timed(Dedup.d20WriteStore(corpusOf(dir), wStore, Dedup.SigWide))))
        out(s"probe_stored_wide_$label") = median((1 to runs).map(_ =>
          timed(noop(Dedup.d20ProbeStored(spark, batch, wStore, Dedup.SigWide)))))
        out(s"rebuild_inline_$label") = median((1 to runs).map(_ =>
          timed(noop(Dedup.d20Frame(corpusOf(dir), batch)))))
      } else {
        val batch = mediaOf(Tables.documents(spark, src)
          .filter(col("doc_id") % 10 === 7))
        def corpusOf(d: String) =
          mediaOf(spark.read.parquet(s"$d/documents.parquet")
            .filter(col("doc_id") % 10 =!= 7))
        out(s"store_build_$label") = median((1 to runs).map(_ =>
          timed(Multimodal.mm9WriteStore(corpusOf(dir), store))))
        out(s"probe_stored_$label") = median((1 to runs).map(_ =>
          timed(noop(Multimodal.mm9ProbeStored(spark, batch, store)))))
        out(s"rebuild_inline_$label") = median((1 to runs).map(_ =>
          timed(noop(Multimodal.mm9Frame(corpusOf(dir), batch)))))
      }
    }
    val fields = out.map { case (k, v) => s"\"$k\":${math.rint(v * 1000) / 1000}" }
    println(s"""{"metric":"${modality}_incremental","f":$f,"runs":$runs,${fields.mkString(",")}}""")
    spark.stop()
  }
}
