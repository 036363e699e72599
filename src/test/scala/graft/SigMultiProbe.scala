package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-probe receipt for the SigWide d20 gate (round-14 verdict #2):
  * recall on planted near-dup pairs at cos 0.90–0.99 versus candidate
  * volume, at probe depths 0 / 1 / 2.
  *
  * Fixture: SigGeomProbe's sign-diverse device — a deterministic
  * hash-random corpus (the sf embeddings are sign-degenerate and
  * cannot exercise banding math) — plus, for every batch vector,
  * one plant per target cosine built by exact rotation
  * (cos·v̂ + sin·ŵ⊥), so the true pair set and its cosine buckets are
  * known by construction.
  *
  * The claim under receipt: depth d raises per-band hit probability
  * from P(X=0) to P(X≤d), X ~ Binomial(16, θ/π), lifting recall below
  * the clone regime (≈30% → ≈97% at cos 0.90 from depth 0 to 2), while
  * candidate volume scales by ≤ |masks| (17 / 137) on the 4·2⁻¹⁶ base
  * rate — still output-bound, nowhere near the n₁·n₂ pair space.
  *
  * Usage: tools/run.sh graft.SigMultiProbe [corpusSize] [nBatch] [runs]
  */
object SigMultiProbe {
  def main(args: Array[String]): Unit = {
    val corpusN = if (args.length > 0) args(0).toInt else 90000
    val nBatch = if (args.length > 1) args(1).toInt else 200
    val runs = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .appName("sig-multiprobe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.queries.Dedup

    val dims = 64
    val cosines = Seq(0.90, 0.925, 0.95, 0.975, 0.99)
    val rnd = new scala.util.Random(20260815L)
    def vec(): Array[Double] = Array.fill(dims)(rnd.nextGaussian())
    def norm(v: Array[Double]): Array[Double] = {
      val nn = math.sqrt(v.map(x => x * x).sum); v.map(_ / nn)
    }
    def plantAt(v: Array[Double], cos: Double): Array[Double] = {
      val vh = norm(v)
      val w = vec()
      val proj = w.zip(vh).map { case (a, b) => a * b }.sum
      val orth = norm(w.zip(vh).map { case (a, b) => a - proj * b })
      val sin = math.sqrt(1 - cos * cos)
      vh.zip(orth).map { case (a, b) => cos * a + sin * b }
    }
    val batchVecs = (0 until nBatch).map(i => (3000000L + i, vec()))
    // plant id encodes (batch index, cosine index) for recall bucketing
    val plants = for {
      ((id, v), bi) <- batchVecs.zipWithIndex
      (c, ci) <- cosines.zipWithIndex
    } yield (4000000L + bi.toLong * 10 + ci, plantAt(v, c), id, ci)
    def toDf(rows: Seq[(Long, Array[Double])]): DataFrame =
      rows.map { case (id, v) => (id, v.map(_.toFloat).toSeq) }
        .toDF("vec_id", "embedding")
    val batchDf = toDf(batchVecs).cache()
    // hash-random decoy corpus built distributed (corpusN × 64 floats)
    val decoys = spark.range(5000000L, 5000000L + corpusN)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dims - 1)), j =>
          ((pmod(xxhash64(col("id"), j), lit(2001L)) - 1000L).cast("float")
            / lit(1000.0f))).as("embedding"))
    val corpusDf = toDf(plants.map(p => (p._1, p._2))).unionByName(decoys)

    val store = "/tmp/sig-multiprobe-store"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(store))
    Dedup.d20WriteStore(corpusDf, store, Dedup.SigWide)

    def cleanup(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc(); Thread.sleep(200)
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }

    val plantByPair = plants.map(p => (p._3, p._1) -> p._4).toMap
    val nPairsSpace = (corpusN + plants.size).toLong * nBatch
    val parts = Seq.newBuilder[String]
    parts += s"\"n_batch\":$nBatch"
    parts += s"\"n_corpus\":${corpusN + plants.size}"
    parts += s"\"pair_space\":$nPairsSpace"
    parts += s"\"cosines\":${cosines.mkString("[", ",", "]")}"
    for (depth <- 0 to 2) {
      // candidate volume: the fanned band equi-join's distinct pairs
      // (plan-deterministic — the faithful scale signal)
      val masks = Dedup.d20ProbeMasks(16, depth)
      val spec = Dedup.SigWide
      val cb = Dedup.embedBandsSpec(Dedup.embedSigsSpec(
        spark.read.parquet(s"$store/sigs")
          .select(col("vec_id"), col("embedding")), spec), spec)
      val bbRaw = Dedup.embedBandsSpec(Dedup.embedSigsSpec(batchDf, spec), spec)
      val bb =
        if (masks.size == 1) bbRaw
        else bbRaw.withColumn("bv",
          explode(array(masks.map(m => col("bv").bitwiseXOR(lit(m))): _*)))
      val cand = bb.as("p").join(cb.as("i"),
          col("p.band") === col("i.band") && col("p.bv") === col("i.bv"))
        .select(col("p.vec_id"), col("i.vec_id")).distinct().count()
      cleanup()
      val verdicts = Dedup.d20ProbeStored(spark, batchDf, store,
          Dedup.SigWide, depth)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      cleanup()
      val recallByCos = cosines.indices.map { ci =>
        val mine = plantByPair.filter(_._2 == ci).keySet
        val hit = mine.count(verdicts.contains)
        math.rint(1000.0 * hit / mine.size) / 1000
      }
      val sec = median((1 to runs).map { _ =>
        val t0 = System.nanoTime()
        Dedup.d20ProbeStored(spark, batchDf, store, Dedup.SigWide, depth)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        cleanup(); dt
      })
      parts += s"""\"depth_$depth\":{"masks":${masks.size},"candidates":$cand,"cand_frac_of_pairs":${math.rint(1e9 * cand / nPairsSpace) / 1e9},"recall_by_cos":${recallByCos.mkString("[", ",", "]")},"probe_sec":${math.rint(sec * 1000) / 1000}}"""
    }
    println(s"""{"metric":"sig_multiprobe",${parts.result().mkString(",")}}""")
    spark.stop()
  }
}
