package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Geometry receipt for the d19 text gate (round-16 verdict #4): the
  * default 32×4 banding versus the sharp 16×8 production geometry, on
  * a corpus engineered to exhibit the sub-threshold candidate mass
  * that saturates wide-band MinHash at scale.
  *
  * Fixture: A archetype families. Every member shares its archetype's
  * 30-token prefix and carries a unique 32-token suffix, so any two
  * family members sit at shingle-Jaccard ≈ 0.30 — BELOW the j ≥ 0.5
  * verify threshold, the pairs a production gate must NOT pay
  * candidate verification for. Each batch item additionally gets one
  * corpus plant at j ≈ {0.5, 0.7, 0.9, 1.0} (suffix-replacement
  * arithmetic: j = (60−k)/(60+k) for k replaced tokens).
  *
  * The S-curve claim under receipt (P = 1 − (1 − s^R)^B):
  *   default 32×4: passes ~23% of the j≈0.3 mass (candidate volume
  *     grows with family², the saturation curve), recall ~87% at 0.5,
  *     ~1.0 at 0.7+;
  *   sharp 16×8: passes ~0.1% of the j≈0.3 mass (output-bound),
  *     recall ~6% at 0.5, ~61% at 0.7, ~1.0 at 0.9+ — the NEAR-CLONE
  *     gate shape, with half the index rows per document.
  *
  * Usage: tools/run.sh graft.MinHashGeomProbe [families] [perFamily] [nBatch] [runs]
  */
object MinHashGeomProbe {
  def main(args: Array[String]): Unit = {
    val families = if (args.length > 0) args(0).toInt else 20
    val perFamily = if (args.length > 1) args(1).toInt else 2500
    val nBatch = if (args.length > 2) args(2).toInt else 200
    val runs = if (args.length > 3) args(3).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .appName("minhash-geom-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.queries.Dedup

    // token plumbing: 62 tokens/doc → 60 trigram shingles
    def prefix(fam: Long): Seq[String] = (0 until 30).map(j => s"a${fam}p$j")
    def doc(fam: Long, tag: String): String =
      (prefix(fam) ++ (0 until 32).map(j => s"${tag}s$j")).mkString(" ")
    // plant at j = (60−k)/(60+k): keep the first 62−k tokens, replace
    // the last k with plant-unique ones
    def plantOf(fam: Long, tag: String, plantTag: String, k: Int): String = {
      val base = prefix(fam) ++ (0 until 32).map(j => s"${tag}s$j")
      (base.dropRight(k) ++ (0 until k).map(j => s"${plantTag}r$j")).mkString(" ")
    }
    val jTargets = Seq(20 -> 0.5, 11 -> 0.69, 3 -> 0.905, 0 -> 1.0)

    // batch: nBatch family members (round-robin across families)
    val batchRows = (0 until nBatch).map { i =>
      (3000000L + i, (i % families).toLong, s"b$i")
    }
    val batchDf = batchRows
      .map { case (id, fam, tag) => (id, doc(fam, tag)) }
      .toDF("doc_id", "text").cache()
    // plants: one per (batch item, j target), corpus-side
    val plantRows = for {
      ((id, fam, tag), bi) <- batchRows.zipWithIndex
      ((k, j), ji) <- jTargets.zipWithIndex
    } yield (4000000L + bi.toLong * 10 + ji,
      plantOf(fam, tag, s"q$bi-$ji", k), id, j)
    // decoys: perFamily members per family, distributed build
    val prefixCol = concat_ws(" ", (0 until 30).map(j =>
      concat(lit("a"), col("fam"), lit(s"p$j"))): _*)
    val suffixCol = concat_ws(" ", (0 until 32).map(j =>
      concat(lit("m"), col("id"), lit(s"s$j"))): _*)
    val decoys = spark.range(5000000L, 5000000L + families.toLong * perFamily)
      .withColumn("fam", col("id") % families)
      .select(col("id").as("doc_id"),
        concat(prefixCol, lit(" "), suffixCol).as("text"))
    val corpusDf = plantRows.map(p => (p._1, p._2)).toDF("doc_id", "text")
      .unionByName(decoys)

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
    val subThresholdPairs =
      nBatch.toLong * perFamily // one family's decoys per batch item
    val parts = Seq.newBuilder[String]
    parts += s"\"n_batch\":$nBatch"
    parts += s"\"n_corpus\":${families.toLong * perFamily + plantRows.size}"
    parts += s"\"subthreshold_pairs\":$subThresholdPairs"
    parts += s"\"j_targets\":${jTargets.map(_._2).mkString("[", ",", "]")}"
    for ((name, spec) <- Seq("default_32x4" -> Dedup.MinHashDefault,
        "sharp_16x8" -> Dedup.MinHashSharp)) {
      val store = s"/tmp/minhash-geom-$name"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(store))
      Dedup.d19WriteStore(corpusDf, store, spec)
      cleanup()
      val indexRows = spark.read.parquet(s"$store/bands").count()
      // candidate volume: the band equi-join's distinct pairs (the
      // work the verify must then discard below threshold)
      val batchSh = Dedup.shingleSetsOf(batchDf).cache()
      val cand = Dedup.minhashBandsSpec(batchSh, spec).as("p")
        .join(spark.read.parquet(s"$store/bands").as("i"),
          col("p.band") === col("i.band") && col("p.bh") === col("i.bh"))
        .select(col("p.doc_id"), col("i.doc_id")).distinct().count()
      cleanup()
      val verdicts = Dedup.d19ProbeStored(spark, batchDf, store, spec)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      cleanup()
      val recallByJ = jTargets.map(_._2).map { j =>
        val mine = plantByPair.filter(_._2 == j).keySet
        math.rint(1000.0 * mine.count(verdicts.contains) / mine.size) / 1000
      }
      val sec = median((1 to runs).map { _ =>
        val t0 = System.nanoTime()
        Dedup.d19ProbeStored(spark, batchDf, store, spec)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        cleanup(); dt
      })
      parts += s"""\"$name\":{"index_rows":$indexRows,"candidates":$cand,"cand_frac_of_subthreshold":${math.rint(1e6 * cand / subThresholdPairs) / 1e6},"recall_by_j":${recallByJ.mkString("[", ",", "]")},"probe_sec":${math.rint(sec * 1000) / 1000}}"""
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(store))
    }
    println(s"""{"metric":"minhash_geom",${parts.result().mkString(",")}}""")
    spark.stop()
  }
}
