package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Signature-geometry receipts for the d20 embedding gate: candidate
  * VOLUMES (plan-deterministic — the faithful scale signal on a VM
  * whose wall-clock swings 3×) plus 3-run-median stored-probe times,
  * per [[graft.queries.Dedup.SigSpec]] geometry, against the
  * DECORRELATED ×F fixture (GateScaleProbe's `embedu`: corpus grows
  * ×F with sign-flipped replicas, true pair set pinned at ×1).
  *
  * Per geometry:
  *  - `pre_distinct`  — band-join rows before the pair distinct (what
  *    the candidate shuffle actually carries),
  *  - `candidates`    — distinct (batch, corpus) candidate pairs (what
  *    the verify join fetches payloads for),
  *  - `buckets`       — candidate buckets the pruned fetch reads (≤ 64),
  *  - `probe_sec`     — d20ProbeStored 3-run median against a store
  *    written at that geometry.
  *
  * Usage: tools/run.sh graft.SigGeomProbe [xFdir] [F] [runs]
  */
object SigGeomProbe {
  def main(args: Array[String]): Unit = {
    val f = if (args.length > 1) args(1).toInt else 50
    val xfDir =
      if (args.length > 0) args(0) else s"/tmp/graft-scale/embedux$f"
    val runs = if (args.length > 2) args(2).toInt else 3
    val src = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .appName("sig-geom-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.Dedup

    // decorrelated ×f fixture (GateScaleProbe's embedu recipe)
    if (!new java.io.File(s"$xfDir/embeddings.parquet").exists()) {
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

    val batch = Tables.embeddings(spark, src)
      .filter(col("vec_id") % 10 === 7)
      .select(col("vec_id"), col("embedding"))
    val corpus = spark.read.parquet(s"$xfDir/embeddings.parquet")
      .filter(col("vec_id") % 10 =!= 7)
      .select(col("vec_id"), col("embedding"))

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

    val nb = batch.count(); val nc = corpus.count()
    val parts = Seq.newBuilder[String]
    parts += s"\"f\":$f"
    parts += s"\"n_batch\":$nb"
    parts += s"\"n_corpus\":$nc"
    for ((name, spec) <- Seq("narrow_16x4" -> Dedup.SigNarrow,
        "mid_64x8" -> Dedup.SigSpec(64, 8),
        "wide_64x4x16" -> Dedup.SigWide)) {
      val cb = Dedup.embedBandsSpec(Dedup.embedSigsSpec(corpus, spec), spec)
      val bb = Dedup.embedBandsSpec(Dedup.embedSigsSpec(batch, spec), spec)
      val joined = bb.as("p").join(cb.as("i"),
        col("p.band") === col("i.band") && col("p.bv") === col("i.bv"))
      val pre = joined.count()
      val pairs = joined.select(col("p.vec_id").as("a"), col("i.vec_id").as("b"))
        .distinct()
      val cand = pairs.count()
      val buckets = pairs
        .select(pmod(xxhash64(col("b")), lit(Dedup.D19Buckets.toLong)))
        .distinct().count()
      cleanup()
      val store = s"/tmp/sig-geom-store-$name"
      Dedup.d20WriteStore(corpus, store, spec); cleanup()
      val probe = median((1 to runs).map(_ => timed(
        Dedup.d20ProbeStored(spark, batch, store, spec)
          .write.format("noop").mode("overwrite").save())))
      parts += s"""\"$name\":{"pre_distinct":$pre,"candidates":$cand,"buckets":$buckets,"probe_sec":${math.rint(probe * 1000) / 1000}}"""
    }
    println(s"""{"metric":"sig_geometry",${parts.result().mkString(",")}}""")
    spark.stop()
  }
}
