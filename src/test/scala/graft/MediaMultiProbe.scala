package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-probe receipt for the mm9 media gate (round-16 verdict #3):
  * recall on planted near-dup payloads at EXACT hammings 1-10 versus
  * candidate volume, at probe depths 0 / 1 / 2 with the verify radius
  * widened to 11 (the depth-2 certification bound).
  *
  * Fixture: chunk-controlled payloads (MultimodalSpec's device) — 64
  * chunks × 4 bytes, per-chunk sums so far from the global mean that
  * flipping a low chunk to high flips exactly its own hash bit. Each
  * batch item gets one corpus plant per target hamming h, with flip
  * positions spread ROUND-ROBIN across the 4 bands, so the minimum
  * per-band diff is exactly ⌊h/4⌋ and the pigeonhole claim under
  * receipt is a stair-step: depth d finds exactly the plants with
  * ⌊h/4⌋ ≤ d — h 1-3 at depth 0, 4-7 at depth 1, 8-10 at depth 2 —
  * recall 1.0 above the step, 0.0 below (no probabilistic residue, by
  * construction). Candidate volume scales by ≤ |masks| (17 / 137) on
  * the batch side against a random-payload decoy corpus.
  *
  * Usage: tools/run.sh graft.MediaMultiProbe [corpusSize] [nBatch] [runs]
  */
object MediaMultiProbe {
  def main(args: Array[String]): Unit = {
    val corpusN = if (args.length > 0) args(0).toInt else 100000
    val nBatch = if (args.length > 1) args(1).toInt else 200
    val runs = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .appName("media-multiprobe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.queries.Multimodal

    val hammings = 1 to 10
    val rnd = new scala.util.Random(20260816L)
    // chunk-controlled base: a random 32/32 high/low chunk pattern per
    // item keeps the global mean centered while varying the phash
    def basePattern(): Array[Boolean] = {
      val p = Array.fill(32)(true) ++ Array.fill(32)(false)
      // Fisher-Yates on the fixed 32/32 split
      for (i <- 63 to 1 by -1) {
        val j = rnd.nextInt(i + 1); val t = p(i); p(i) = p(j); p(j) = t
      }
      p
    }
    def payload(pattern: Array[Boolean]): Array[Byte] = {
      val bytes = new Array[Byte](256)
      for (k <- 0 until 64; j <- 0 until 4)
        bytes(4 * k + j) = if (pattern(k)) 'z'.toByte else '!'.toByte
      bytes
    }
    // flip h low chunks, round-robin across bands (band b = chunks
    // 16b..16b+15), so per-band diffs are ⌈h/4⌉ or ⌊h/4⌋ exactly
    def plantOf(pattern: Array[Boolean], h: Int): Array[Byte] = {
      val p = pattern.clone()
      val lowByBand = (0 until 4).map(b =>
        (16 * b until 16 * (b + 1)).filter(k => !p(k)).toList).toArray
      var flipped = 0
      var b = 0
      while (flipped < h) {
        lowByBand(b) match {
          case k :: rest => p(k) = true; lowByBand(b) = rest; flipped += 1
          case Nil => ()
        }
        b = (b + 1) % 4
      }
      payload(p)
    }
    val batchRows = (0 until nBatch).map { i =>
      (3000000L + i, basePattern())
    }
    val plantRows = for {
      ((id, pat), bi) <- batchRows.zipWithIndex
      h <- hammings
    } yield (4000000L + bi.toLong * 100 + h, plantOf(pat, h), id, h)
    val batchDf = batchRows
      .map { case (id, pat) => (id, payload(pat), "bin") }
      .toDF("media_id", "payload", "format").cache()
    // decoy corpus: deterministic pseudo-random payloads, built
    // distributed (unhex of chained xxhash64 hex — 256 bytes each)
    val decoys = spark.range(5000000L, 5000000L + corpusN)
      .select(col("id").as("media_id"),
        unhex(concat_ws("", (0 until 32).map(j =>
          lpad(hex(xxhash64(col("id"), lit(j))), 16, "0")): _*)).as("payload"),
        lit("bin").as("format"))
    val corpusDf = plantRows
      .map { case (id, pl, _, _) => (id, pl, "bin") }
      .toDF("media_id", "payload", "format").unionByName(decoys)

    val store = "/tmp/media-multiprobe-store"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(store))
    Multimodal.mm9IndexRows(corpusDf).write.mode("overwrite")
      .parquet(s"$store/bands")

    def cleanup(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .filterNot(_.id == batchDf.rdd.id)
        .foreach(_.unpersist(blocking = true))
      System.gc(); Thread.sleep(300); System.gc()
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }

    val plantByPair = plantRows.map(p => (p._3, p._1) -> p._4).toMap
    val nPairsSpace = (corpusN + plantRows.size).toLong * nBatch
    val parts = Seq.newBuilder[String]
    parts += s"\"n_batch\":$nBatch"
    parts += s"\"n_corpus\":${corpusN + plantRows.size}"
    parts += s"\"pair_space\":$nPairsSpace"
    parts += s"\"hammings\":${hammings.mkString("[", ",", "]")}"
    for (depth <- 0 to 2) {
      // candidate volume: the fanned band equi-join's distinct pairs
      val masks = graft.queries.Dedup.d20ProbeMasks(
        Multimodal.PhashBandChars, depth)
      val index = spark.read.parquet(s"$store/bands")
      val bpRaw = Multimodal.mm9IndexRows(batchDf)
      val cand = (if (masks.size == 1)
          bpRaw.as("p").join(index.as("i"),
            col("p.band") === col("i.band") && col("p.bs") === col("i.bs"))
        else {
          val pv = bpRaw.withColumn("bv", explode(array(masks.map(m =>
            conv(col("bs"), 2, 10).cast("long").bitwiseXOR(lit(m))): _*)))
          val iv = index.withColumn("bv",
            conv(col("bs"), 2, 10).cast("long"))
          pv.as("p").join(iv.as("i"),
            col("p.band") === col("i.band") && col("p.bv") === col("i.bv"))
        })
        .select(col("p.media_id"), col("i.media_id")).distinct().count()
      cleanup()
      val verdicts = Multimodal.mm9ProbeDirs(spark, batchDf,
          Seq(s"$store/bands"), depth, maxHamming = 11)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      cleanup()
      val recallByH = hammings.map { h =>
        val mine = plantByPair.filter(_._2 == h).keySet
        val hit = mine.count(verdicts.contains)
        math.rint(1000.0 * hit / mine.size) / 1000
      }
      val sec = median((1 to runs).map { _ =>
        val t0 = System.nanoTime()
        Multimodal.mm9ProbeDirs(spark, batchDf, Seq(s"$store/bands"),
            depth, maxHamming = 11)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        cleanup(); dt
      })
      parts += s"""\"depth_$depth\":{"masks":${masks.size},"candidates":$cand,"cand_frac_of_pairs":${math.rint(1e9 * cand / nPairsSpace) / 1e9},"recall_by_hamming":${recallByH.mkString("[", ",", "]")},"probe_sec":${math.rint(sec * 1000) / 1000}}"""
    }
    println(s"""{"metric":"media_multiprobe",${parts.result().mkString(",")}}""")
    spark.stop()
  }
}
