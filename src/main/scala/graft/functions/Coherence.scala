package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** O-M3: c_v topic coherence (Röder, Both & Hinneburg 2015 — the measure
  * gensim's CoherenceModel(coherence='c_v') implements, used by the
  * reference for LDA model selection at topic_modelling.ipynb lines
  * 366-371). MLlib has no counterpart, so this is a composed DataFrame
  * job plus a driver-side finish on the tiny topic-word statistics:
  *
  *  1. virtual documents: sliding windows of `windowSize` (110, the c_v
  *     default) token positions over each document's token sequence;
  *  2. window occurrence counts N(w) and N(wi,wj) restricted to the
  *     topic words (≤ k×topN distinct strings — the only data that
  *     leaves the corpus scan is per-window topic-word incidence);
  *  3. NPMI(wi,wj) with gensim's epsilon=1e-12;
  *  4. S_one_set segmentation: per topic word, the NPMI context vector
  *     against ALL topic words; topic coherence = mean cosine between
  *     each word's vector and the topic's summed vector.
  *
  * Scale: the corpus pass is one explode + grouped distinct count —
  * shuffle keys are (window, word∈topicWords) pairs only, so cost scales
  * with corpus size × topN density, never vocabulary². The driver-side
  * finish touches a k×topN×topN matrix (∼10⁴ doubles).
  */
object Coherence {

  /** Per-window incidence counts for the given word set. Returns
    * (singleCounts, pairCounts, totalWindows) — pair keys are (lo, hi)
    * sorted.
    */
  def windowCounts(
      tokens: DataFrame, // (doc_id, tokens: array<string>)
      words: Set[String],
      windowSize: Int): (Map[String, Long], Map[(String, String), Long], Long) = {
    val spark = tokens.sparkSession
    import spark.implicits._
    val wordsB = spark.sparkContext.broadcast(words)

    // windows: c_v slides a window of 110 over each doc; docs shorter
    // than the window form a single window (gensim behavior)
    val windowed = tokens.select(col("doc_id"), col("tokens"))
      .as[(Long, Seq[String])]
      .flatMap { case (docId, toks) =>
        val n = toks.length
        val wins =
          if (n == 0) Iterator.empty
          else if (n <= windowSize) Iterator(toks)
          else toks.sliding(windowSize)
        wins.zipWithIndex.map { case (w, i) =>
          (docId, i, w.filter(wordsB.value.contains).distinct)
        }
      }
      .toDF("doc_id", "win_id", "present")
      .cache()

    val totalWindows = windowed.count()
    val single = windowed
      .select(explode(col("present")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val pairs = windowed
      .select(col("doc_id"), col("win_id"), explode(col("present")).as("w1"),
        col("present"))
      .select(col("doc_id"), col("win_id"), col("w1"), explode(col("present")).as("w2"))
      .filter(col("w1") < col("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    windowed.unpersist()
    (single, pairs, totalWindows)
  }

  /** c_v coherence per topic. `topicWords`: topN terms per topic. */
  def cv(
      tokens: DataFrame,
      topicWords: Seq[Seq[String]],
      windowSize: Int = 110): Seq[Double] = {
    val eps = 1e-12
    val all = topicWords.flatten.toSet
    val (single, pairs, totW) = windowCounts(tokens, all, windowSize)
    def p(w: String): Double = single.getOrElse(w, 0L).toDouble / totW
    def pj(a: String, b: String): Double = {
      val key = if (a < b) (a, b) else (b, a)
      pairs.getOrElse(key, 0L).toDouble / totW
    }
    def npmi(a: String, b: String): Double = {
      if (a == b) 1.0
      else {
        val joint = pj(a, b)
        val pa = p(a); val pb = p(b)
        if (pa == 0.0 || pb == 0.0) 0.0
        else {
          val pmi = math.log((joint + eps) / (pa * pb))
          pmi / -math.log(joint + eps)
        }
      }
    }
    def cos(x: Array[Double], y: Array[Double]): Double = {
      var d = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < x.length) { d += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1 }
      if (nx == 0.0 || ny == 0.0) 0.0 else d / math.sqrt(nx * ny)
    }
    topicWords.map { words =>
      val ctx = words.map(w => words.map(o => npmi(w, o)).toArray)
      val setVec = ctx.transpose.map(_.sum).toArray
      val sims = ctx.map(v => cos(v, setVec))
      if (sims.isEmpty) 0.0 else sims.sum / sims.size
    }
  }
}
