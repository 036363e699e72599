package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Signature-geometry receipts for the d20 embedding gate: candidate
  * VOLUMES (plan-deterministic — the faithful scale signal on a VM
  * whose wall-clock swings 3×) plus 3-run-median stored-probe times per
  * [[graft.queries.Dedup.SigSpec]] geometry.
  *
  * FIXTURE (and why it is not a replica blow-up of the sf0.1 table):
  * the synthetic embeddings are SIGN-DEGENERATE — the entire 2,000-
  * vector corpus yields exactly TWO distinct 64-bit hyperplane-sign
  * signatures (measured round 14; the vectors are effectively
  * one-dimensional for sign purposes), so any corpus grown by
  * replicating/perturbing it collides half of ALL pairs under EVERY
  * geometry and no banding can prune — that degeneracy, not the
  * 64-cell narrow width alone, is what the earlier ×50 "saturation"
  * receipts were measuring. Real embedding corpora have sign
  * diversity; this probe models that with a deterministic hash-random
  * corpus (dims from xxhash64(id, dim), uniform in [-1, 1]): corpus
  * sign bits are iid, so a batch×corpus pair passes a band with
  * probability 2^-bandBits and the geometry math is actually
  * exercised. One near-dup of every batch vector is planted (ids
  * 2e9+k) so the TRUE pair set is fixed (~|batch|) while the corpus
  * grows ×F — per-batch probe cost flat in corpus size is exactly the
  * claim under test.
  *
  * Per geometry: `pre_distinct` (band-join rows before the pair
  * distinct — what the candidate shuffle carries), `candidates`
  * (distinct pairs the verify fetches payloads for), `buckets`
  * (candidate buckets the pruned fetch reads, ≤ 64), `true_pairs`
  * (reported verdicts — must be ≥ the planted count under every
  * geometry), `probe_sec` (d20ProbeStored 3-run median against a
  * store written at that geometry).
  *
  * Usage: tools/run.sh graft.SigGeomProbe [corpusSize] [runs]
  */
object SigGeomProbe {
  def main(args: Array[String]): Unit = {
    val corpusN = if (args.length > 0) args(0).toLong else 90000L
    val runs = if (args.length > 1) args(1).toInt else 3
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

    val batch = Tables.embeddings(spark, src)
      .filter(col("vec_id") % 10 === 7)
      .select(col("vec_id"), col("embedding"))
    val dims = 64
    // hash-random corpus: deterministic, sign-diverse
    val randCorpus = spark.range(1000000000L, 1000000000L + corpusN)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dims - 1)), j =>
          ((pmod(xxhash64(col("id"), j), lit(2001L)) - 1000L).cast("float")
            / lit(1000.0f))).as("embedding"))
    // one planted near-dup per batch vector: fixed true-pair floor
    val plants = batch.select((col("vec_id") + 2000000000L).as("vec_id"),
      transform(col("embedding"), x => x + lit(0.0005f)).as("embedding"))
    val corpus = randCorpus.unionByName(plants)

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

    val nb = batch.count()
    val parts = Seq.newBuilder[String]
    parts += s"\"n_batch\":$nb"
    parts += s"\"n_corpus\":${corpusN + nb}"
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
      val truePairs = Dedup.d20ProbeStored(spark, batch, store, spec).count()
      cleanup()
      val probe = median((1 to runs).map(_ => timed(
        Dedup.d20ProbeStored(spark, batch, store, spec)
          .write.format("noop").mode("overwrite").save())))
      parts += s"""\"$name\":{"pre_distinct":$pre,"candidates":$cand,"buckets":$buckets,"true_pairs":$truePairs,"probe_sec":${math.rint(probe * 1000) / 1000}}"""
    }
    println(s"""{"metric":"sig_geometry",${parts.result().mkString(",")}}""")
    spark.stop()
  }
}
